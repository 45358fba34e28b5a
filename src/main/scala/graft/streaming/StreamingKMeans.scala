package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.plans.VectorExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming mini-batch k-means — centroid maintenance over an unbounded
  * embedding stream (the online form of [[graft.similarity.KMeans]], after
  * the classic mini-batch/streaming k-means update): each micro-batch
  * assigns its vectors to the nearest current centroid with the same
  * native codegen argmin the batch operator uses (a narrow scan, zero
  * exchanges), then moves every centroid toward its batch members'
  * mean weighted by the counts seen so far:
  *
  *   c' = (c · n_decayed + Σ batch members) / (n_decayed + n_batch),
  *   n' = n_decayed + n_batch,   n_decayed = n · decay
  *
  * `decay` = 1 is the exact running mean over everything seen (order-
  * dependent only through assignment, like every online k-means);
  * `decay` < 1 half-lives old mass so the centroids track drift.
  * Deterministic: no RNG — initial centroids are caller-supplied, batch
  * contributions are sums (order-independent within a batch), and the
  * assignment tie-breaks on (distance, centroid id).
  *
  * Driver state is k·d doubles + k counts — bounded like the batch
  * operator's collected centroid matrix, and exactly what you would
  * checkpoint to resume. */
object StreamingKMeans {

  final case class Model(centroids: Seq[(Long, Array[Double])],
                         counts: Map[Long, Double]) {
    /** Assign a batch frame (vec_id, embedding) with the current model. */
    def assign(vecs: DataFrame, idCol: String, embCol: String): DataFrame = {
      val toDouble = transform(col(embCol), x => x.cast("double"))
      val best = VectorExpressions.nearestCentroid(toDouble,
        centroids.map(_._1).toArray, centroids.map(_._2).toArray)
      vecs.select(col(idCol).cast("long").as("vec_id"),
        best.getField("cid").as("cluster_id"),
        round(best.getField("d2"), 6).as("dist2"))
    }
  }

  final class Handle private[StreamingKMeans] (ref: AtomicReference[Model]) {
    def currentModel: Model = ref.get()
  }

  /** Start maintaining centroids over a streaming embedding frame whose
    * vector column is `embCol` (same parameterization as [[Model.assign]]).
    * `init` seeds the model (id → vector); ids keep their identity for the
    * stream's lifetime. */
  def start(vecs: DataFrame, checkpointLocation: String,
            init: Seq[(Long, Array[Double])],
            decay: Double = 1.0,
            embCol: String = "embedding"): (StreamingQuery, Handle) = {
    require(init.nonEmpty, "need at least one initial centroid")
    require(decay > 0 && decay <= 1.0, "decay must be in (0, 1]")
    require(vecs.columns.contains(embCol),
      s"stream has no '$embCol' column (columns: ${vecs.columns.mkString(", ")})")
    val dims = init.head._2.length
    require(init.forall(_._2.length == dims), "centroid dims must agree")
    val ref = new AtomicReference[Model](
      Model(init.sortBy(_._1), init.map { case (cid, _) => cid -> 0.0 }.toMap))
    // replay guard: foreachBatch is at-least-once, and unlike the set-union
    // operators this update is NOT naturally idempotent (a re-folded batch
    // would double-count) — so remember the last committed batch id and
    // drop redeliveries
    val lastBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
    val query = vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastBatch.get()) {
          ref.set(foldBatch(ref.get(), batch, embCol, decay))
          lastBatch.set(batchId)
        }
      }
      .start()
    (query, new Handle(ref))
  }

  /** One mini-batch model update (the math in the scaladoc above) — shared
    * with [[StreamingIvfIndex]], which maintains the same centroid state
    * alongside its cell index. */
  private[streaming] def foldBatch(model: Model, batch: DataFrame,
                                   embCol: String, decay: Double): Model = {
    val dims = model.centroids.head._2.length
    val toDouble = transform(col(embCol), x => x.cast("double"))
    val best = VectorExpressions.nearestCentroid(toDouble,
      model.centroids.map(_._1).toArray,
      model.centroids.map(_._2).toArray)
    // per-cluster count + per-dimension sum: map-side combined, one
    // bounded (k × d) collect — the mini-batch sufficient statistics
    val aggs = count(lit(1)).cast("double").as("n") +:
      (1 to dims).map(i =>
        sum(element_at(toDouble, i)).as(s"s$i"))
    val stats = batch
      .select(col(embCol), best.getField("cid").as("cid"))
      .groupBy(col("cid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), (1 to dims).map(i => r.getDouble(i + 1)).toArray))
      .toMap
    val next = model.centroids.map { case (cid, c) =>
      stats.get(cid) match {
        case None => (cid, c) // no members this batch: unchanged
        case Some((n, sums)) =>
          val nOld = model.counts(cid) * decay
          val w = nOld + n
          (cid, c.zip(sums).map { case (cv, sv) => (cv * nOld + sv) / w })
      }
    }
    val nextCounts = model.counts.map { case (cid, nPrev) =>
      cid -> (nPrev * decay + stats.get(cid).map(_._1).getOrElse(0.0))
    }
    Model(next, nextCounts)
  }
}
