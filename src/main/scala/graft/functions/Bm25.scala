package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 lexical ranking (Robertson/Walker et al., TREC-3) — the
  * standard retrieval score behind corpus search and query-targeted
  * curation (pull the documents most relevant to a probe query out of a
  * 100 TB corpus). Lucene-style idf: ln(1 + (N − df + 0.5)/(df + 0.5)),
  * always positive.
  *
  * Plan shape at scale: the term filter (`isin` over the query's terms)
  * lands directly on the token explode, so the corpus pass reduces to the
  * matching postings immediately — work scales with the POSTING LISTS of
  * the query terms, not the corpus token count; term df and the corpus
  * stats (N, avgdl) are broadcast scalars; the final top-k is a
  * TakeOrderedAndProject (bounded per-partition heaps), never a global
  * sort. That is an inverted-index probe expressed relationally.
  *
  * Deterministic: scores rounded to 6 dp before the cut, ties broken by
  * doc_id — reproducible across engines and runs. */
object Bm25 {

  /** Top-k documents for `queryTerms` by BM25.
    * Returns (doc_id, n_terms, bm25): matched-term count and the rounded
    * score, ordered by (bm25 desc, doc_id). */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
              topK: Int = 20,
              tok: Column => Column =
                TextAnalysis.unicodeTokens): DataFrame = {
    // `tok` defaults to the unicode tokenizer (NFKC + letter/digit runs) so
    // punctuation-glued and CJK corpora index correctly; supply query terms
    // at the same grain (NFKC-normalized letter/digit runs)
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      tok(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("double").as("dl"))
    // postings of the query terms only: the isin filter sits on the explode
    val matched = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dfT = matched.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val tf = matched.groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val w = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("w", w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), round(sum(col("w")), 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(topK)
  }
}
