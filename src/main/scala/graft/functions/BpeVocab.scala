package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE vocabulary induction — the tokenizer-training primitive: repeatedly
  * merge the most frequent adjacent symbol pair across the corpus
  * (Sennrich-style byte-pair encoding over word frequencies).
  *
  * Scale shape: training runs on the WORD-FREQUENCY table, not the corpus —
  * one corpus-wide tokenize+count shuffle produces `(word, wc)`, and every
  * merge round after that is a scan + map-side-combined aggregation of that
  * bounded vocabulary table (a 100 TB corpus has millions of distinct
  * words, not trillions). The driver holds exactly one (pair, count) row
  * per round — the argmax — never data.
  *
  * Symbol sequences are rendered as strings of `(sym)` groups
  * (`"hello"` → `"(h)(e)(l)(l)(o)"`). With both delimiters distinct,
  * replacing the literal `"(a)(b)"` with `"(ab)"` is EXACTLY the greedy
  * left-to-right non-overlapping merge BPE specifies: adjacent occurrences
  * share no characters (no separator is consumed across matches, so
  * `[a,a,a,a]` merges to `[aa,aa]`, not `[aa,a,a]`), and a match can never
  * start or end inside a longer symbol (`"(xa)(b)"` does not contain
  * `"(a)(b)"`). That also makes every round reproducible in the DuckDB
  * oracle as plain string `replace`. Symbols are restricted to `[a-z]+`
  * words so the delimiters cannot occur inside a symbol.
  */
object BpeVocab {

  final case class Merge(merge_idx: Long, pair: String, merged: String,
                         pair_count: Long)

  /** The corpus reduction BPE trains on: lowercase `[a-z]+` words with
    * frequencies. One shuffle; everything after is vocabulary-sized. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("wc"))

  /** Adjacent symbol pairs of an encoded word, each as the literal
    * `"(a)(b)"` merge key. */
  private def pairsOf(enc: Column): Column = {
    val syms = expr("regexp_extract_all(enc, '\\\\([a-z]*\\\\)', 0)")
    // guard: sequence(1, 0) would DESCEND for a single-symbol word (a long
    // word fully merged into one symbol), so emit no pairs explicitly
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat(element_at(syms, i), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Run `nMerges` merge rounds over a `(word, wc)` table. Returns the
    * learned merge table in order — `(merge_idx, pair, merged,
    * pair_count)` — which IS the tokenizer artifact BPE training exists to
    * produce. Ties break deterministically on (count desc, pair asc).
    * Stops early if the vocabulary runs out of pairs. */
  def train(wordCounts: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, "need at least one merge round")
    val spark = wordCounts.sparkSession
    var enc = wordCounts.select(col("word"), col("wc"),
        regexp_replace(col("word"), "(.)", "($1)").as("enc"))
      .persist()
    enc.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    var i = 1
    while (i <= nMerges && !exhausted) {
      val top = enc
        // cheap necessary condition for ≥2 symbols (each group is ≥3
        // chars); the pairsOf guard handles long single-symbol words
        .filter(length(col("enc")) >= 6)
        .select(col("wc"), explode(pairsOf(col("enc"))).as("pr"))
        .groupBy(col("pr")).agg(sum(col("wc")).as("c"))
        .orderBy(desc("c"), asc("pr"))
        .limit(1)
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some(row) =>
          val pair = row.getString(0)
          // "(a)(b)" → "(ab)" for the encoding; the reported merge rule is
          // the bare new symbol "ab" (the vocabulary entry)
          val mergedEnc = pair.replace(")(", "")
          merges += Merge(i.toLong, pair,
            mergedEnc.stripPrefix("(").stripSuffix(")"), row.getLong(1))
          // literal (non-regex) replace; pair text is [a-z()] only
          val next = enc.withColumn("enc",
              expr(s"replace(enc, '$pair', '$mergedEnc')"))
            .persist()
          next.count()
          enc.unpersist(false)
          enc = next
          i += 1
      }
    }
    enc.unpersist(false)
    merges.toSeq
  }

  /** [[wordCounts]] + [[train]] as one DataFrame-in, DataFrame-out
    * operator. */
  def learnedMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(wordCounts(docs, textCol), nMerges).toDF()
  }

  /** The `(sym)`-group encoding of `word` after replaying the learned
    * merges in training order — encode (tokenizer APPLY, the other half
    * of the artifact [[train]] produces) is a pure fold of literal
    * replaces: ONE codegen projection, no UDF, no join, with the same
    * delimiter guarantees as training (greedy left-to-right,
    * non-overlapping, never inside a longer symbol).
    *
    * Scale: apply this to the DISTINCT-word table and equi-join back to
    * the token stream — encode work is then ∝ vocabulary (millions), not
    * corpus tokens (trillions). Inline application is also safe (it is
    * per-row column arithmetic); the join form just avoids re-encoding a
    * hot word a billion times. */
  def encodedCol(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(regexp_replace(word, "(.)", "($1)")) { (c, m) =>
      replace(c, lit(m.pair), lit(m.pair.replace(")(", "")))
    }

  /** BPE tokens of `word` (bare symbols, in order) under `merges`. Like
    * training, the symbol domain is `[a-z]` — characters outside it are
    * not extracted as tokens (feed words from [[wordCounts]]'s `[a-z]+`
    * tokenization, the contract the whole module documents). */
  def tokensCol(word: Column, merges: Seq[Merge]): Column =
    regexp_extract_all(encodedCol(word, merges),
      lit("\\(([a-z]*)\\)"), lit(1))
}
