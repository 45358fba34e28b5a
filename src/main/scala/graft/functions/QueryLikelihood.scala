package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
  * SIGIR 2001) — the language-model ranking family next to BM25's
  * probabilistic one: score(q,d) = Σ_t ln((tf_td + μ·P(t|C)) / (dl + μ)),
  * with P(t|C) the collection unigram model. Unlike BM25 the smoothing
  * gives EVERY document a score over every query term, which the direct
  * form would pay a corpus × terms explode for. The factored identity
  * used here keeps the plan posting-bounded:
  *
  *   score(q,d) = S − |q|·ln(dl + μ) + Σ_{t matched} ln(1 + tf·|C|/(μ·cf_t))
  *
  * where S = Σ_t ln(μ·cf_t/|C|) is a query-level scalar. The corpus-wide
  * work is one narrow (doc_id, dl) scan; only the query terms' postings
  * aggregate; S/|C|/cf cross in as broadcast one-row frames (computed
  * IN-PLAN so the oracle's arithmetic is order-identical); the cut is a
  * TakeOrderedAndProject. Query terms absent from the corpus (cf = 0)
  * drop out of BOTH the scalar and the correction — same rule as the SQL
  * oracle's inner join.
  *
  * Deterministic: scores rounded to 6 dp, ties broken by doc_id. */
object QueryLikelihood {

  /** Top-k documents for `queryTerms` by Dirichlet query likelihood.
    * Returns (doc_id, n_terms, ql): matched-term count and the rounded
    * log-likelihood, ordered by (ql desc, doc_id). */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], mu: Double = 300.0,
              topK: Int = 20,
              tok: Column => Column =
                TextAnalysis.unicodeTokens): DataFrame = {
    // `tok` defaults to the unicode tokenizer — same grain contract as
    // [[Bm25.topDocs]] (query terms must be letter/digit runs)
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(mu > 0.0, "mu must be positive")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      tok(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("double").as("dl"))
    val matched = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tot = base.agg(sum(col("dl")).as("totc"))
    // collection frequency of the present query terms (cf > 0 by
    // construction — absent terms simply produce no row)
    val cf = matched.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("cf"))
    val qScalar = cf.crossJoin(broadcast(tot))
      .agg(sum(log(lit(mu) * col("cf") / col("totc"))).as("s"),
        count(lit(1)).cast("double").as("nq"))
    val contrib = matched.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .join(broadcast(cf), Seq("term"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(log(lit(1.0) + col("tf") * col("totc") / (lit(mu) * col("cf"))))
        .as("c"), count(lit(1)).as("n_terms"))
    base.select(col("doc_id"), col("dl"))
      .crossJoin(broadcast(qScalar))
      .join(contrib, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        round(col("s") - col("nq") * log(col("dl") + mu) +
          coalesce(col("c"), lit(0.0)), 6).as("ql"))
      .orderBy(desc("ql"), asc("doc_id"))
      .limit(topK)
  }
}
