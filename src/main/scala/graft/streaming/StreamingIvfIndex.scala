package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.similarity.CellAssignment
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVF index maintenance — keeping an approximate-nearest-
  * neighbor cell index alive as the embedding stream drifts.
  *
  * Two pieces of state evolve per micro-batch:
  *
  *  1. **Centroids** — the same mini-batch k-means fold as
  *     [[StreamingKMeans]] (shared code), so the coarse quantizer TRACKS
  *     the stream instead of fossilizing at its initialization.
  *  2. **Corpus** — each batch lands in `corpusDir/batch=<id>` with
  *     overwrite, so a redelivered batch rewrites the same directory:
  *     the accumulation is idempotent across restarts by construction
  *     (this is the standard exactly-once foreachBatch file-sink recipe,
  *     and at 100 TB the "accumulated corpus" IS the lake table the
  *     stream was ingesting anyway).
  *
  * The index itself — (vec_id, cell_id) under the CURRENT centroids — is
  * formed on demand by [[Handle.currentIndex]]: one narrow zero-exchange
  * scan of the accumulated corpus through the native in-row argmax
  * ([[CellAssignment]], the same cosine/tie-break convention every batch
  * IVF operator and oracle uses). Forming it lazily is the point: under
  * drift every assignment is potentially stale, so eagerly rewriting
  * per batch does corpus-sized work per micro-batch, while the on-demand
  * re-form pays that cost only when a reader wants the index (a
  * production refinement re-assigns just the vectors whose top cell
  * changed — work ∝ drift — without changing this API).
  *
  * Deterministic end to end: the fold is order-independent within a
  * batch, duplicates collapse latest-batch-wins, and assignment
  * tie-breaks on (score, cell id). Driver state is k·d doubles + k
  * counts — exactly what [[start]] accepts back as the resume seed. */
object StreamingIvfIndex {

  final class Handle private[StreamingIvfIndex] (
      ref: AtomicReference[StreamingKMeans.Model],
      corpusDir: String, idCol: String, embCol: String) {

    def currentModel: StreamingKMeans.Model = ref.get()

    /** The current coarse-quantizer cells (ids ascending, norms in the
      * vec_dot convention) — what [[graft.similarity.Similarity.ivfTopK]]
      * style probing consumes. */
    def currentCells: CellAssignment.Cells = {
      val m = ref.get()
      val sorted = m.centroids.sortBy(_._1)
      CellAssignment.Cells(sorted.map(_._1), sorted.map(_._2),
        sorted.map { case (_, a) =>
          var s = 0.0; var j = 0
          while (j < a.length) { s += a(j) * a(j); j += 1 }
          math.sqrt(s)
        })
    }

    /** The IVF cell index of everything ingested so far, under the CURRENT
      * centroids: `(vec_id, cell_id)`. Duplicate vec_ids collapse to their
      * latest batch (redelivery-safe, update-safe). */
    def currentIndex(spark: SparkSession): DataFrame = {
      val cells = currentCells
      val toDouble = transform(col(embCol), x => x.cast("double"))
      // within one batch a duplicated vec_id ties on `batch`, so break on
      // a content hash of the embedding — deterministic no matter which
      // physical row the scan surfaces first (idCol is constant inside
      // its own partition and useless as a tie-break)
      val latest = Window.partitionBy(col(idCol))
        .orderBy(desc("batch"), xxhash64(col(embCol)).desc)
      spark.read.parquet(corpusDir)
        .withColumn("__rn", row_number().over(latest))
        .filter(col("__rn") === 1)
        .select(col(idCol).cast("long").as("vec_id"),
          CellAssignment.assignedCell(cells, toDouble)
            .getField("cid").as("cell_id"))
    }
  }

  /** Start maintaining the index over a streaming embedding frame.
    * `init` seeds the centroids; pass a previously persisted model's
    * centroids AND `initCounts` to RESUME after a stop (the checkpoint
    * skips committed batches; the corpus directory already holds their
    * rows idempotently). */
  def start(vecs: DataFrame, checkpointLocation: String, corpusDir: String,
            init: Seq[(Long, Array[Double])],
            initCounts: Map[Long, Double] = Map.empty,
            decay: Double = 1.0,
            idCol: String = "vec_id",
            embCol: String = "embedding"): (StreamingQuery, Handle) = {
    require(init.nonEmpty, "need at least one initial centroid")
    require(decay > 0 && decay <= 1.0, "decay must be in (0, 1]")
    require(vecs.columns.contains(idCol) && vecs.columns.contains(embCol),
      s"stream needs '$idCol' and '$embCol' columns " +
        s"(columns: ${vecs.columns.mkString(", ")})")
    val ref = new AtomicReference[StreamingKMeans.Model](
      StreamingKMeans.Model(init.sortBy(_._1),
        init.map { case (cid, _) => cid -> initCounts.getOrElse(cid, 0.0) }
          .toMap))
    // within-run replay guard for the (non-idempotent) model fold; the
    // corpus write needs none — the batch-keyed overwrite is idempotent
    val lastBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
    val query = vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          batch.select(col(idCol), col(embCol))
            .write.mode("overwrite")
            .parquet(s"$corpusDir/batch=$batchId")
          if (batchId > lastBatch.get()) {
            ref.set(StreamingKMeans.foldBatch(ref.get(), batch, embCol, decay))
            lastBatch.set(batchId)
          }
        } finally batch.unpersist(false)
      }
      .start()
    (query, new Handle(ref, corpusDir, idCol, embCol))
  }
}
