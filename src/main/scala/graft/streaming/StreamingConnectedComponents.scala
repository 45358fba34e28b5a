package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming cluster maintenance: fold an unbounded stream of candidate
  * pairs (e.g. the MinHash-LSH edge stream of a continuously-ingesting
  * corpus) into a maintained connected-components labeling, one micro-batch
  * at a time via [[Dedup.connectedComponentsIncremental]].
  *
  * Each batch pays the QUOTIENT-graph contraction — work proportional to
  * the batch's edges and the components they touch (as super-nodes, not
  * members); untouched components pass through frozen. The maintained
  * state is the compact materialized (doc_id, cluster_id) table, exactly
  * what the batch operator returns.
  *
  * Replay safety (foreachBatch is at-least-once): folding the SAME pair
  * batch in twice is a no-op — replayed edges project onto their
  * components' roots as self-loops and vanish (Dedup.scala quotient-graph
  * construction), so labels converge to batch CC over the union of all
  * delivered edges regardless of redelivery. That idempotence is the
  * property test's replayed-increments case, and it is what makes this
  * operator safe under checkpoint-recovery semantics.
  *
  * Driver-side state is a REFERENCE to a materialized DataFrame, not data;
  * superseded labelings are released for the ContextCleaner. For restart
  * durability, persist `currentLabels` to a table in the same foreachBatch
  * transaction and seed `initialLabels` from it on resume — the resumed
  * run then equals the uninterrupted one (the checkpoint skips committed
  * batches, the seed supplies their state; exercised end-to-end by the
  * resume spec). */
object StreamingConnectedComponents {

  final class Handle private[StreamingConnectedComponents] (
      ref: AtomicReference[DataFrame]) {
    /** The labeling after the most recently committed micro-batch:
      * (doc_id, cluster_id), component minima. None before the first. */
    def currentLabels: Option[DataFrame] = Option(ref.get())
  }

  /** Start maintaining labels over a streaming `(doc_a, doc_b)` frame.
    * `initialLabels` seeds recovery from a persisted labeling (must be a
    * valid CC output — what both batch entry points return). */
  def start(pairs: DataFrame, checkpointLocation: String,
            initialLabels: Option[DataFrame] = None,
            maxIterations: Int = 20): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[DataFrame](initialLabels.orNull)
    val query = pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val next = ref.get() match {
          case null =>
            val endpoints = batch.select(col("doc_a").as("doc_id"))
              .union(batch.select(col("doc_b").as("doc_id"))).distinct()
            Dedup.connectedComponents(batch, endpoints, "doc_id",
              maxIterations)
          case prev =>
            Dedup.connectedComponentsIncremental(prev, batch, maxIterations)
        }
        ref.set(next)
      }
      .start()
    (query, new Handle(ref))
  }
}
