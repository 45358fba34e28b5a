package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-corpus doc by how much its hashed n-gram distribution
  * resembles a small TARGET set (the high-quality/in-domain sample you
  * wish the whole corpus looked like), then keep the top of the ranking.
  *
  * The published recipe, re-expressed Spark-first:
  *  - features = word unigrams + bigrams, hashed into a fixed number of
  *    buckets (feature hashing bounds the model at `buckets` cells no
  *    matter the corpus vocabulary — the trick that makes the method
  *    100 TB-safe);
  *  - bucket unigram models for target and raw with add-1 smoothing;
  *  - doc weight = Σ over the doc's feature INSTANCES of
  *    ln(p_target(bucket) / p_raw(bucket)).
  *
  * Plan shape: one corpus scan builds the bucket histogram (map-side
  * combined, ≤ `buckets` rows — both models in ONE aggregation via a
  * conditional count), collected driver-side into the two count vectors
  * (the same bounded state the streaming maintainer holds); a second
  * scan re-derives the feature stream and scores it through a BROADCAST
  * join against the bucket log-ratio table (bounded by construction),
  * then one map-side-combined per-doc sum. Nothing wide ever shuffles;
  * the model never leaves broadcast size — and the log-ratio formula
  * exists ONCE ([[logRatioTable]]), shared by the batch and streaming
  * paths, so the two cannot diverge.
  *
  * Deterministic: the feature hash is the portable 56-bit md5 family
  * ([[graft.dedup.Dedup.hexHash]]), so DuckDB rebuilds the identical
  * buckets, models, and scores for the oracle.
  */
object ImportanceWeights {

  /** Per-doc DSIR log importance weight. `isTarget` marks the target rows
    * INSIDE `docs` (target docs score too — they are part of the raw
    * corpus); the raw model is the whole input. Returns
    * (doc_id, n_feat, dsir_logratio) with the sum rounded to 6 dp. */
  def dsirLogRatios(docs: DataFrame, idCol: String, textCol: String,
                    isTarget: Column, buckets: Int,
                    salt: String = "dsir|"): DataFrame = {
    require(buckets >= 2, "need at least two hash buckets")
    val feats = featureBuckets(docs, idCol, textCol,
      Seq("__tgt" -> isTarget.cast("boolean")), buckets, salt)
    // both models in one corpus scan, collected at ≤ `buckets` rows; the
    // scoring scan below re-derives the (cheap, narrow) feature stream
    // rather than persisting the corpus-sized explode
    val (nT, nAll) = countVectors(feats, buckets)
    scoreFeatures(feats, logRatioTable(docs.sparkSession, nT, nAll))
  }

  /** The two per-bucket count vectors of a feature stream (must carry the
    * `__tgt` marker column) — ONE map-side-combined aggregation, ≤
    * `buckets` rows collected. Shared by the batch scorer above and the
    * per-micro-batch fold in
    * [[graft.streaming.StreamingImportanceWeights]]. */
  private[graft] def countVectors(feats: DataFrame, buckets: Int)
      : (Array[Long], Array[Long]) = {
    val nT = new Array[Long](buckets)
    val nAll = new Array[Long](buckets)
    feats.groupBy(col("__b"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("n_t"))
      .collect() // ≤ buckets rows by construction
      .foreach { r =>
        val b = r.getLong(0).toInt
        nAll(b) = r.getLong(1)
        nT(b) = r.getLong(2)
      }
    (nT, nAll)
  }

  /** The hashed feature-bucket stream — one (doc_id, extra…, __b) row per
    * unigram/bigram INSTANCE. Shared by the batch scorer above and the
    * running model fold in
    * [[graft.streaming.StreamingImportanceWeights]]. */
  private[graft] def featureBuckets(docs: DataFrame, idCol: String,
      textCol: String, extra: Seq[(String, Column)], buckets: Int,
      salt: String): DataFrame = {
    // unicode token grain (round-13 engine default) — DSIR and the NB
    // router hash the SAME features a multilingual corpus really has
    val toks = TextAnalysis.unicodeTokens(col(textCol))
    // native codegen bigrams for n >= 2; a 1-token doc has NO bigram (the
    // width-2 shingle of a 1-token doc would duplicate its unigram)
    val bigrams = when(size(toks) >= 2,
      graft.plans.TextExpressions.wordShingles(toks, 2))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).cast("long").as("doc_id") +:
        extra.map { case (n, c) => c.as(n) } :+
        explode(concat(toks, bigrams)).as("__f"): _*)
      .select(col("doc_id") +: extra.map { case (n, _) => col(n) } :+
        pmod(graft.dedup.Dedup.hexHash(col("__f"), salt),
          lit(buckets.toLong)).as("__b"): _*)
  }

  /** Per-doc scoring of a feature stream against a (broadcast-bounded)
    * bucket log-ratio table. */
  private[graft] def scoreFeatures(feats: DataFrame, lr: DataFrame): DataFrame =
    feats.join(broadcast(lr), Seq("__b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"),
        round(sum(col("__lr")), 6).as("dsir_logratio"))

  /** The (__b, __lr) table of a count-vector model, computed driver-side
    * (2·buckets longs of state). StrictMath.log — the same function
    * Spark's `log` expression applies — so a model folded on the driver
    * scores identically to the in-plan batch formulation. */
  private[graft] def logRatioTable(spark: org.apache.spark.sql.SparkSession,
      nT: Array[Long], nAll: Array[Long]): DataFrame = {
    import spark.implicits._
    val b = nAll.length
    val totT = nT.sum.toDouble
    val totAll = nAll.sum.toDouble
    (0 until b).map { i =>
      (i.toLong, StrictMath.log(((nT(i) + 1.0) / (totT + b)) /
        ((nAll(i) + 1.0) / (totAll + b))))
    }.toDF("__b", "__lr")
  }
}
