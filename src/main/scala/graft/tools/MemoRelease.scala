package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of a materialized (checkpointed) DataFrame's
  * storage — the teardown half of `Dedup.materializeAndRelease`.
  *
  * A `localCheckpoint` result is a [[LogicalRDD]] over an RDD whose blocks
  * sit in executor storage until the ContextCleaner notices the RDD is
  * unreachable — which needs a driver GC cycle, so "drop the reference"
  * frees nothing promptly. Long benchmark/verify sessions accumulate every
  * memo's blocks that way, pressuring storage memory and GC (the measured
  * full-suite inflation of the heavy dedup lines). Unpersisting the
  * underlying RDD releases the blocks NOW.
  *
  * After release the DataFrame is unusable (lineage was truncated at the
  * checkpoint — there is nothing to recompute from); callers must drop
  * every reference, which is exactly the memo-registry contract. Reliable
  * (file-based) checkpoints hold no blocks; for them this is a no-op and
  * the files are reclaimed by the ContextCleaner under
  * `cleanCheckpoints=true` once unreferenced. */
object MemoRelease {

  /** Release the storage under `df`. Returns `true` when a checkpointed
    * RDD's blocks were unpersisted (the frame is DEAD afterwards — its
    * lineage was truncated at the checkpoint); `false` for the plain
    * `persist()` path (cache entry dropped, frame stays usable and just
    * recomputes — used where a checkpoint write would cost more than one
    * recompute). Callers that narrate releases can use the flag to
    * distinguish block frees from cache drops. */
  def release(df: DataFrame): Boolean = df.queryExecution.logical match {
    case l: LogicalRDD =>
      l.rdd.unpersist(blocking = false)
      true
    case _ =>
      df.unpersist(blocking = false)
      false
  }
}
