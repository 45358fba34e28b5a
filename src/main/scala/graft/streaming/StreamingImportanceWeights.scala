package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import graft.functions.ImportanceWeights
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DSIR model maintenance — the running form of
  * [[graft.functions.ImportanceWeights]]: as docs stream in, fold their
  * hashed n-gram bucket counts into the target/raw count vectors, so the
  * importance model TRACKS the corpus instead of fossilizing at whatever
  * slice existed when it was fit.
  *
  * State is 2·buckets longs — fixed for the stream's lifetime no matter
  * how many docs or distinct n-grams flow through (feature hashing is
  * exactly what makes the model stream-safe). Each micro-batch
  * contributes one bounded (≤ buckets rows) map-side-combined histogram
  * collect; the fold is associative and order-independent, so the
  * streamed model equals the batch model of the union at every fold
  * point.
  *
  * Scoring is ON DEMAND (the [[StreamingIvfIndex]] discipline): under a
  * drifting model every stored score is potentially stale, so
  * [[Handle.logRatios]] scores a frame against the CURRENT model — one
  * broadcast of the bucket table, never a corpus rewrite per batch.
  *
  * Replay/resume: foreachBatch is at-least-once and this fold is not
  * idempotent (a re-folded batch would double-count), so redeliveries
  * are dropped on the last-committed batch id — the [[StreamingKMeans]]
  * guard. To RESUME after a stop, persist [[Handle.currentModel]]'s two
  * arrays and pass them back as `init`; the checkpoint skips committed
  * batches and the seeded fold continues exactly where it stopped. */
object StreamingImportanceWeights {

  /** The running model: per-bucket feature-instance counts for the
    * target slice and the whole stream. */
  final case class Model(nT: Array[Long], nAll: Array[Long]) {
    require(nT.length == nAll.length, "model arrays must agree in size")
    def buckets: Int = nAll.length
  }

  final class Handle private[StreamingImportanceWeights] (
      ref: AtomicReference[Model], salt: String) {

    def currentModel: Model = ref.get()

    /** Score `docs` under the CURRENT model — identical output contract
      * to [[ImportanceWeights.dsirLogRatios]]
      * (doc_id, n_feat, dsir_logratio). */
    def logRatios(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
      val m = ref.get()
      ImportanceWeights.scoreFeatures(
        ImportanceWeights.featureBuckets(docs, idCol, textCol, Nil,
          m.buckets, salt),
        ImportanceWeights.logRatioTable(docs.sparkSession, m.nT, m.nAll))
    }
  }

  /** Start maintaining the model over a streaming doc frame. `isTarget`
    * marks target rows inside the stream (evaluated per batch). Pass a
    * previously persisted model as `init` to resume. */
  def start(docs: DataFrame, checkpointLocation: String, isTarget: Column,
            buckets: Int, init: Option[Model] = None,
            idCol: String = "doc_id", textCol: String = "text",
            salt: String = "dsir|"): (StreamingQuery, Handle) = {
    require(buckets >= 2, "need at least two hash buckets")
    init.foreach(m => require(m.buckets == buckets,
      s"init model has ${m.buckets} buckets, expected $buckets"))
    val ref = new AtomicReference[Model](init.getOrElse(
      Model(new Array[Long](buckets), new Array[Long](buckets))))
    val lastBatch = new AtomicLong(-1L)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastBatch.get()) {
          ref.set(foldBatch(ref.get(), batch, idCol, textCol, isTarget, salt))
          lastBatch.set(batchId)
        }
      }
      .start()
    (query, new Handle(ref, salt))
  }

  /** One micro-batch fold: the batch's bounded bucket histogram merged
    * into the running count vectors. */
  private[streaming] def foldBatch(m: Model, batch: DataFrame, idCol: String,
      textCol: String, isTarget: Column, salt: String): Model = {
    val hist = ImportanceWeights.featureBuckets(batch, idCol, textCol,
        Seq("__tgt" -> isTarget.cast("boolean")), m.buckets, salt)
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("n_t"))
      .collect() // ≤ buckets rows by construction
    val nT = m.nT.clone()
    val nAll = m.nAll.clone()
    hist.foreach { r =>
      val b = r.getLong(0).toInt
      nAll(b) += r.getLong(1)
      nT(b) += r.getLong(2)
    }
    Model(nT, nAll)
  }
}
