package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.operators.WeightedSample
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming priority sampling — a maintained fixed-size weighted sample
  * over an unbounded stream (the audit/inspection cut of a corpus that is
  * still arriving).
  *
  * Priority sampling folds perfectly into a stream BECAUSE the priorities
  * are deterministic (w/u with u from the portable id hash, no RNG): the
  * top-(n+1) of a union is the top-(n+1) of (top-(n+1) ∪ batch), so the
  * maintained state is just the current ≤ n+1 highest-priority rows — a
  * driver-bounded artifact, fixed size forever on an unbounded stream —
  * and the streamed sample provably EQUALS the batch [[WeightedSample]]
  * over the union corpus at every point. τ re-derives from the state on
  * read, so estimator weights stay exact as the cut tightens.
  *
  * Replay safety: a redelivered doc_id carries the identical (weight,
  * priority) row — the fold dedups on doc_id, so at-least-once delivery
  * is a no-op.
  *
  * Restart: persist [[Handle.currentTopRows]] with the checkpoint and
  * feed it back as `initialState` — the checkpoint skips committed
  * batches, the seed restores their fold (the
  * [[StreamingMinHashLsh]] recovery contract). */
object StreamingWeightedSample {

  final class Handle private[StreamingWeightedSample] (
      ref: AtomicReference[DataFrame], n: Int) {
    /** The raw maintained ≤ n+1-row state (what a restart persists). */
    def currentTopRows: Option[DataFrame] = Option(ref.get())
    /** The τ-finalized sample after the most recent committed batch —
      * identical to batch prioritySample over everything ingested. */
    def currentSample: Option[DataFrame] =
      Option(ref.get()).map(WeightedSample.finalizeSample(_, n))
  }

  def start(docs: DataFrame, checkpointLocation: String, idCol: String,
            weightCol: String, n: Int, salt: String = "prio|",
            initialState: Option[DataFrame] = None): (StreamingQuery, Handle) = {
    require(n >= 1, "sample size must be >= 1")
    val ref = new AtomicReference[DataFrame](initialState.orNull)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchTop = WeightedSample
          .priorities(batch, idCol, col(weightCol), salt)
        val unioned = Option(ref.get())
          .fold(batchTop)(_.unionByName(batchTop))
          // deterministic priorities: a replayed id is an identical row
          .dropDuplicates("doc_id")
          .orderBy(desc("priority"), asc("doc_id")).limit(n + 1)
        // materialize the tiny state eagerly: the fold must not chain
        // lazily across the stream's lifetime
        val next = graft.dedup.Dedup.materializeAndRelease(unioned)
        ref.set(next)
      }
      .start()
    (query, new Handle(ref, n))
  }
}
