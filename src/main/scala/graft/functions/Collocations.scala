package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram collocation mining by pointwise mutual information — the phrase
  * detection stage of a text pipeline (Mikolov-style phrase merging,
  * vocabulary induction for tokenizers): PMI(w1, w2) =
  * ln( P(w1 w2) / (P(w1)·P(w2)) ) over consecutive token pairs, with a
  * minimum pair count so hapax coincidences don't dominate the top of the
  * list.
  *
  * Plan shape at 100 TB: bigrams extract IN-ROW (slice + arrays_zip +
  * explode — no positional self-join of the token table); the pair and
  * unigram counts are map-side-combined aggregations; the PMI join runs
  * equi on the term with the two corpus scalars broadcast; the final
  * cut is a TakeOrderedAndProject. */
object Collocations {

  /** Top-`topK` bigrams by rounded PMI (ties on the words) among pairs
    * seen ≥ `minCount` times. Returns (w1, w2, c12, pmi). */
  def topPmiBigrams(docs: DataFrame, textCol: String, minCount: Long,
                    topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    val t = TextAnalysis.unicodeTokens(col(textCol))
    val n1 = greatest(size(t) - 1, lit(0))
    val bigrams = docs
      .select(explode(arrays_zip(
        slice(t, lit(1), n1).as("w1"),
        slice(t, lit(2), n1).as("w2"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val bc = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val uni = LanguageModel.unigramCounts(docs, textCol)
    val nu = uni.agg(sum(col("c")).cast("double").as("nu"))
    val nb = bc.agg(sum(col("c12")).cast("double").as("nb"))
    bc.filter(col("c12") >= minCount)
      .join(uni.select(col("term").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nu))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12").cast("double") / col("nb")) /
          ((col("c1").cast("double") / col("nu")) *
            (col("c2").cast("double") / col("nu")))), 6).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(topK)
  }
}
