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

  /** Release the checkpoint blocks under `df`. Returns true when a
    * checkpointed RDD was found and unpersisted. Non-checkpointed memos
    * (plain `persist()` caches, used where the table is cheap enough that
    * a checkpoint write would cost more than one recompute) release their
    * cache entry instead — those stay usable afterwards, they just
    * recompute. */
  def release(df: DataFrame): Boolean = df.queryExecution.logical match {
    case l: LogicalRDD =>
      l.rdd.unpersist(blocking = false)
      true
    case _ =>
      df.unpersist(blocking = false)
      true
  }
}
