package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language model scoring — the perplexity-filter
  * stage of a pretraining pipeline (CCNet-style: score every document by
  * cross-entropy under a language model and drop the tails; here the LM is
  * the corpus's own smoothed unigram distribution, the degenerate-but-
  * deterministic member of the KenLM family).
  *
  * Model: P(w) = (c(w) + α) / (N + α·(V + 1)) with add-α smoothing; the
  * +1 virtual type reserves mass for out-of-vocabulary tokens (scored as
  * c = 0) so cross-corpus application is total. Per document:
  * cross-entropy H = −(1/len) Σ ln P(wᵢ) and perplexity e^H.
  *
  * Plan shape at 100 TB: the unigram table is corpus-sized (NOT broadcast
  * — a vocabulary can be billions of types at web scale); scoring is one
  * shuffle equi-join of the token stream against it on the term, with the
  * two model scalars (N, V) broadcast. Work ∝ corpus tokens — the same
  * inverted shape as TF-IDF, and the join key is the term so AQE handles
  * stopword skew. */
object LanguageModel {

  /** The smoothed unigram table (term, c) plus scalars as a broadcast-able
    * one-row frame (n_tokens, v_types). */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))

  /** Per-document cross-entropy and perplexity under the corpus's own
    * add-α unigram model. Returns (doc_id, n_scored, cross_entropy,
    * perplexity), rounded to 6 dp. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 alpha: Double = 1.0): DataFrame = {
    val uni = unigramCounts(docs, textCol)
    val stats = uni.agg(sum(col("c")).cast("double").as("n_tokens"),
      count(lit(1)).cast("double").as("v_types"))
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(trim(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val logp = log((col("c").cast("double") + lit(alpha)) /
      (col("n_tokens") + lit(alpha) * (col("v_types") + lit(1.0))))
    toks
      .join(uni, Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        (-sum(logp) / count(lit(1))).as("h"))
      .select(col("doc_id"), col("n_scored"),
        round(col("h"), 6).as("cross_entropy"),
        round(exp(col("h")), 6).as("perplexity"))
  }
}
