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
  def unigramCounts(docs: DataFrame, textCol: String,
                    tok: Column => Column =
                      TextAnalysis.unicodeTokens): DataFrame =
    // unicode tokenizer by default (round-13 migration): a space-free CJK
    // document contributes per-ideograph-run types instead of one
    // whole-doc token; the blank filter is a no-op under it (unicode
    // tokens are non-empty by construction) but guards the legacy grain
    docs.select(explode(tok(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("c"))

  /** The smoothed bigram table (w1, w2, c12) over in-row consecutive token
    * pairs — the same no-positional-self-join shape as
    * [[Collocations.pmiBigrams]]: adjacency is resolved inside each row's
    * token array, so building the table is one narrow pass + one groupBy.
    * Pairs where either side is the empty token are dropped (mirroring the
    * unigram table's blank filter). */
  def bigramCounts(docs: DataFrame, textCol: String,
                   tok: Column => Column =
                     TextAnalysis.unicodeTokens): DataFrame = {
    val t = tok(col(textCol))
    docs
      .select(explode(zip_with(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
  }

  /** Per-document cross-entropy and perplexity under the corpus's own
    * add-α unigram model. Returns (doc_id, n_scored, cross_entropy,
    * perplexity), rounded to 6 dp. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 alpha: Double = 1.0,
                 tok: Column => Column =
                   TextAnalysis.unicodeTokens): DataFrame = {
    val uni = unigramCounts(docs, textCol, tok)
    val stats = uni.agg(sum(col("c")).cast("double").as("n_tokens"),
      count(lit(1)).cast("double").as("v_types"))
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tok(col(textCol))).as("term"))
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

  /** Per-document perplexity under an INTERPOLATED bigram model — the
    * CCNet-style upgrade of [[perplexity]]: each token with a (non-empty)
    * predecessor scores
    *
    *   P(w | v) = λ·P_b(w | v) + (1−λ)·P_u(w),
    *   P_b(w | v) = (c(v, w) + α) / (c(v) + α·(V + 1))
    *
    * with the same deterministic add-α smoothing and +1 OOV type as the
    * unigram model; document-initial tokens (no history) score P_u alone.
    * Returns (doc_id, n_scored, cross_entropy, perplexity), 6 dp.
    *
    * Plan shape at 100 TB: identical to the unigram scorer with one more
    * corpus-sized equi-join — the (prev, w) token-pair stream joins the
    * bigram table on its composite key (never broadcast-by-assumption:
    * web-scale bigram vocabularies are billions of rows), plus the two
    * unigram joins; predecessors are resolved IN-ROW from the token array
    * (no per-doc window or positional self-join). */
  def perplexityInterpolated(docs: DataFrame, idCol: String, textCol: String,
                             alpha: Double = 1.0,
                             lambda: Double = 0.7,
                             tok: Column => Column =
                               TextAnalysis.unicodeTokens): DataFrame = {
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0, 1]")
    val uni = unigramCounts(docs, textCol, tok)
    val big = bigramCounts(docs, textCol, tok)
    val stats = uni.agg(sum(col("c")).cast("double").as("n_tokens"),
      count(lit(1)).cast("double").as("v_types"))
    val t = tok(col(textCol))
    // (doc_id, w, prev): prev = the RAW preceding token ('' for the first
    // position, so an empty-token neighbor also falls back to unigram —
    // matching bigramCounts' blank filter)
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"), t.as("t"),
        posexplode(t).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), col("w"),
        when(col("pos") > 0, element_at(col("t"), col("pos")))
          .otherwise(lit("")).as("prev"))
    val denomU = col("n_tokens") + lit(alpha) * (col("v_types") + lit(1.0))
    val pU = (col("cw").cast("double") + lit(alpha)) / denomU
    val pB = (coalesce(col("c12"), lit(0L)).cast("double") + lit(alpha)) /
      (coalesce(col("cprev"), lit(0L)).cast("double") +
        lit(alpha) * (col("v_types") + lit(1.0)))
    val logp = when(col("prev") === "", log(pU))
      .otherwise(log(lit(lambda) * pB + lit(1.0 - lambda) * pU))
    toks
      .join(uni.select(col("term").as("w"), col("c").as("cw")), Seq("w"))
      .join(uni.select(col("term").as("prev"), col("c").as("cprev")),
        Seq("prev"), "left")
      .join(big.select(col("w1").as("prev"), col("w2").as("w"), col("c12")),
        Seq("prev", "w"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        (-sum(logp) / count(lit(1))).as("h"))
      .select(col("doc_id"), col("n_scored"),
        round(col("h"), 6).as("cross_entropy"),
        round(exp(col("h")), 6).as("perplexity"))
  }

  /** Per-document perplexity under an interpolated KNESER-NEY bigram
    * model — the smoothing the production KenLM stage actually ships
    * (Kneser & Ney 1995; Chen & Goodman 1999 found it the consistently
    * best n-gram smoother): instead of backing off to RAW unigram
    * frequency (which overweights words that are frequent only inside one
    * collocation — the "San Francisco" pathology), the backoff weight is
    * the CONTINUATION probability, how many distinct contexts a word
    * follows:
    *
    *   P_KN(w | v) = max(c(v,w) − D, 0) / c(v)
    *               + (D · N1+(v,·) / c(v)) · P_cont(w),
    *   P_cont(w)   = (N1+(·,w) + 1) / (B + V + 1)
    *
    * with absolute discount `D`, N1+(v,·) = distinct words following v,
    * N1+(·,w) = distinct contexts preceding w, B = distinct bigram types,
    * V = unigram types. The +1/(V+1) add-one on the continuation
    * distribution is this engine's deterministic totality convention (the
    * same +1 OOV type as the add-α models): P_cont > 0 for every token,
    * so cross-corpus application is total. Document-initial tokens (and,
    * cross-corpus, tokens after a never-seen context, where c(v) = 0)
    * score P_cont alone. Returns (doc_id, n_scored, cross_entropy,
    * perplexity), 6 dp.
    *
    * Plan shape at 100 TB: identical to [[perplexityInterpolated]] — the
    * (prev, w) stream equi-joins the bigram table on its composite key,
    * and BOTH context marginals (c(v), N1+(v,·)) come out of ONE
    * aggregation over that table; the continuation table is one more
    * vocabulary-sized aggregation joined on the term. Scalars (B, V)
    * broadcast as a one-row frame. Nothing here is
    * broadcast-by-assumption. */
  def perplexityKneserNey(docs: DataFrame, idCol: String, textCol: String,
                          discount: Double = 0.75,
                          tok: Column => Column =
                            TextAnalysis.unicodeTokens): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val uni = unigramCounts(docs, textCol, tok)
    val big = bigramCounts(docs, textCol, tok)
    // both context marginals in one pass over the bigram table
    val ctx = big.groupBy(col("w1").as("prev"))
      .agg(sum(col("c12")).as("cv"), count(lit(1)).as("n1fwd"))
    val cont = big.groupBy(col("w2").as("w"))
      .agg(count(lit(1)).as("n1bwd"))
    val stats = big.agg(count(lit(1)).cast("double").as("b_types"))
      .crossJoin(uni.agg(count(lit(1)).cast("double").as("v_types")))
    val t = tok(col(textCol))
    // (doc_id, w, prev): prev = '' at the first position — the same
    // in-row predecessor resolution as the interpolated scorer
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"), t.as("t"),
        posexplode(t).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .select(col("doc_id"), col("w"),
        when(col("pos") > 0, element_at(col("t"), col("pos")))
          .otherwise(lit("")).as("prev"))
    val pCont = (coalesce(col("n1bwd"), lit(0L)).cast("double") + lit(1.0)) /
      (col("b_types") + col("v_types") + lit(1.0))
    val cvD = col("cv").cast("double")
    val pKn = greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(discount),
      lit(0.0)) / cvD +
      (lit(discount) * col("n1fwd").cast("double") / cvD) * pCont
    // doc-initial or (cross-corpus) unseen context → pure continuation
    val logp = when(col("prev") === "" || col("cv").isNull, log(pCont))
      .otherwise(log(pKn))
    toks
      .join(cont, Seq("w"), "left")
      .join(ctx, Seq("prev"), "left")
      .join(big.select(col("w1").as("prev"), col("w2").as("w"), col("c12")),
        Seq("prev", "w"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"),
        (-sum(logp) / count(lit(1))).as("h"))
      .select(col("doc_id"), col("n_scored"),
        round(col("h"), 6).as("cross_entropy"),
        round(exp(col("h")), 6).as("perplexity"))
  }

  /** Entropy-based bigram pruning losses — the model-compression step a
    * production n-gram deployment runs before shipping (Stolcke 1998's
    * relative-entropy criterion; KenLM's `--prune` is the same idea on
    * counts): for every bigram entry, the expected per-token
    * log-likelihood LOSS on the training corpus if that entry were
    * dropped and its tokens scored through the backoff path of
    * [[perplexityInterpolated]]'s model,
    *
    *   loss(v,w) = (c(v,w) / N) · ln( p_keep / p_prune ),
    *   p_keep  = λ·(c(v,w)+α)/(c(v)+α(V+1)) + (1−λ)·p_U(w),
    *   p_prune = λ·(    α   )/(c(v)+α(V+1)) + (1−λ)·p_U(w)
    *
    * (p_prune is p_keep with the entry's count zeroed — exactly what the
    * scorer's `coalesce(c12, 0)` computes for an absent entry). Entries
    * with loss below a threshold are safe to drop: the model shrinks,
    * corpus perplexity moves by ≈ Σ pruned losses.
    *
    * Returns the per-bigram decision table (w1, w2, c12, loss) — loss
    * UNROUNDED; callers cut/round. Scale shape: one bigram-table-sized
    * frame, two vocabulary equi-joins, scalars broadcast as a one-row
    * frame; nothing corpus-sized shuffles. */
  def bigramPruneLoss(docs: DataFrame, textCol: String,
                      alpha: Double = 1.0,
                      lambda: Double = 0.7,
                      tok: Column => Column =
                        TextAnalysis.unicodeTokens): DataFrame = {
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0, 1]")
    val uni = unigramCounts(docs, textCol, tok)
    val big = bigramCounts(docs, textCol, tok)
    val stats = uni.agg(sum(col("c")).cast("double").as("n_tokens"),
      count(lit(1)).cast("double").as("v_types"))
    val denomU = col("n_tokens") + lit(alpha) * (col("v_types") + lit(1.0))
    val pU2 = (col("c2").cast("double") + lit(alpha)) / denomU
    val denomB = col("c1").cast("double") + lit(alpha) * (col("v_types") + lit(1.0))
    val pKeep = lit(lambda) * (col("c12").cast("double") + lit(alpha)) / denomB +
      lit(1.0 - lambda) * pU2
    val pPrune = lit(lambda) * lit(alpha) / denomB + lit(1.0 - lambda) * pU2
    big
      .join(uni.select(col("term").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("term").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(stats))
      .select(col("w1"), col("w2"), col("c12"),
        ((col("c12").cast("double") / col("n_tokens")) * log(pKeep / pPrune))
          .as("loss"))
  }
}
