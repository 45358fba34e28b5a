package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.operators.Triangles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming graph-density maintenance: fold an unbounded candidate-pair
  * stream (the near-dup edge stream of a continuously-ingesting corpus)
  * into maintained per-node triangle counts and clustering coefficients,
  * one micro-batch at a time via [[Triangles.perNodeIncrement]].
  *
  * Each batch pays work proportional to its edges' 2-hop neighborhood —
  * the only region whose counts can change — never the accumulated graph;
  * untouched nodes pass through frozen. Replay safety (foreachBatch is
  * at-least-once): already-indexed edges anti-join away inside the batch
  * primitive, so redelivery is a no-op and the maintained metrics equal
  * the batch [[Triangles.perNode]] over the union of all delivered edges
  * at every fold point — the spec's invariant.
  *
  * Driver-side state is a reference pair (edges, per-node metrics), both
  * materialized; superseded tables are released for the ContextCleaner.
  * For restart durability, persist both to tables in the same
  * foreachBatch transaction and seed `initial` from them on resume. */
object StreamingTriangles {

  final class Handle private[StreamingTriangles] (
      ref: AtomicReference[(DataFrame, DataFrame)]) {
    /** (doc_id, degree, n_triangles, clustering) after the most recently
      * committed micro-batch. None before the first. */
    def currentMetrics: Option[DataFrame] = Option(ref.get()).map(_._2)
    /** The accumulated canonical edge set. None before the first batch. */
    def currentEdges: Option[DataFrame] = Option(ref.get()).map(_._1)
  }

  /** Start maintaining per-node triangle metrics over a streaming
    * `(doc_a, doc_b)` frame. `initial` seeds recovery from a persisted
    * (edges, perNode) pair. */
  def start(pairs: DataFrame, checkpointLocation: String,
            initial: Option[(DataFrame, DataFrame)] = None): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[(DataFrame, DataFrame)](initial.orNull)
    val query = pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val canon = batch
          .select(least(col("doc_a"), col("doc_b")).cast("long").as("doc_a"),
            greatest(col("doc_a"), col("doc_b")).cast("long").as("doc_b"))
          .filter(col("doc_a") =!= col("doc_b"))
          .distinct()
        val next = ref.get() match {
          case null =>
            val edges = canon.localCheckpoint(true)
            (edges, Triangles.perNode(edges).localCheckpoint(true))
          case (edges, perNode) =>
            Triangles.perNodeIncrement(edges, perNode, batch)
        }
        ref.set(next)
      }
      .start()
    (query, new Handle(ref))
  }
}
