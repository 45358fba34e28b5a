package graft.streaming

import java.util.concurrent.atomic.AtomicReference

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
  * are dropped on the last-FOLDED batch id, which the model itself
  * carries — model and replay cursor commit atomically through the one
  * `ref.set`, and persisting [[Handle.currentModel]] persists both. That
  * closes the crash window a session-local cursor leaves open: a batch
  * folded into the model but not yet committed to Spark's checkpoint is
  * re-delivered on restart, and only an id INSIDE the persisted snapshot
  * can know to drop it. To RESUME after a stop, persist
  * [[Handle.currentModel]] and pass it back as `init`; committed batches
  * are skipped by the checkpoint, the uncommitted-but-folded one (if
  * any) by the carried id. */
object StreamingImportanceWeights {

  /** The running model: per-bucket feature-instance counts for the
    * target slice and the whole stream, plus the id of the last batch
    * folded in (the replay/resume cursor — part of the model precisely
    * so the two persist and commit together). */
  final case class Model(nT: Array[Long], nAll: Array[Long],
                         lastBatch: Long = -1L) {
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
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the cursor is read from (and written into) the model, so a
        // restart seeded with a persisted model also inherits exactly
        // which batches that model already contains
        if (batchId > ref.get().lastBatch) {
          ref.set(foldBatch(ref.get(), batch, idCol, textCol, isTarget, salt)
            .copy(lastBatch = batchId))
        }
      }
      .start()
    (query, new Handle(ref, salt))
  }

  /** One micro-batch fold: the batch's bounded bucket histogram (the
    * shared [[ImportanceWeights.countVectors]] aggregation) merged into
    * the running count vectors. Leaves `lastBatch` untouched — the
    * foreachBatch closure stamps it as the commit step. */
  private[streaming] def foldBatch(m: Model, batch: DataFrame, idCol: String,
      textCol: String, isTarget: Column, salt: String): Model = {
    val (bT, bAll) = ImportanceWeights.countVectors(
      ImportanceWeights.featureBuckets(batch, idCol, textCol,
        Seq("__tgt" -> isTarget.cast("boolean")), m.buckets, salt), m.buckets)
    val nT = m.nT.clone()
    val nAll = m.nAll.clone()
    var i = 0
    while (i < m.buckets) { nT(i) += bT(i); nAll(i) += bAll(i); i += 1 }
    Model(nT, nAll, m.lastBatch)
  }
}
