package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.storage.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest INTO the transactional snapshot store — the piece
  * that turns micro-batch arrival into readable-as-of table versions:
  * each committed micro-batch becomes ONE atomic manifest commit holding
  * the accumulated corpus (prior version ∪ batch), so any downstream
  * reader can time-travel to "the corpus as of batch N" while ingestion
  * keeps running, and maintenance ([[SnapshotStore.compact]] /
  * `cluster`) interleaves through the same commit protocol without
  * stopping the stream. Downstream consumers follow the table WITHOUT
  * re-scanning history via [[SnapshotStore.readChangesSince]] — each
  * ingest commit's added files ARE its batch.
  *
  * Exactly-once versioning without a two-phase dance, against an
  * at-least-once `foreachBatch`:
  *  - REPLAY GUARD: each commit's operation tag is `ingest-b<batchId>`;
  *    at query start the already-committed batch ids are loaded from the
  *    manifest log, and a redelivered batch id (crash after the manifest
  *    rename but before the checkpoint offset commit) is SKIPPED instead
  *    of re-appended — the same replay-guard discipline as the sibling
  *    streaming-state modules (e.g. `StreamingKMeans`), enforced here at
  *    the commit-log level so duplicates cannot leak into later versions.
  *  - the store's manifest rename makes each COMMIT atomic; the torn
  *    window (data files written, manifest missing, then a crash) is the
  *    store's torn-commit contract: invisible to every reader, and —
  *    since the ingest query is single-writer per checkpoint by
  *    construction — the replayed batch RECLAIMS the orphaned data dir
  *    unattended (`reclaimGraceMs = 0`) and commits, so a crash never
  *    wedges the stream into a restart loop. Nothing half-committed is
  *    ever readable (spec-proven in `SnapshotStoreSpec`; the
  *    streamed==batch fold and the replay guard are
  *    `StreamingSnapshotIngestSpec`'s business).
  *
  * Scale shape: each commit is an APPEND ([[SnapshotStore.commitAppend]]):
  * the new manifest carries the prior version's immutable files and only
  * the batch's bytes hit disk — commit cost O(batch), never O(corpus),
  * and history is never rewritten. The replay-guard set is batch IDS
  * (one long per commit), loaded once per query start — O(versions)
  * driver work at start, O(1) per batch. Small files accumulate at
  * exactly the rate micro-batches arrive, which is what the interleaved
  * [[SnapshotStore.compact]] maintenance commit exists to fold away. */
object StreamingSnapshotIngest {

  final class Handle private[StreamingSnapshotIngest] (
      dir: String, ref: AtomicReference[java.lang.Long]) {
    /** The table directory versions are committed to. */
    def tableDir: String = dir
    /** Last version committed by THIS query instance. */
    def lastCommitted: Option[Long] = Option(ref.get()).map(_.longValue())
  }

  /** Start committing each micro-batch of `docs` as a new snapshot
    * version at `tableDir` (operation `ingest-b<batchId>`, an APPEND
    * commit: the manifest carries the prior version's files and only the
    * batch's bytes are written). Version N always reads as the full
    * accumulated corpus — a batch id already present in the manifest log
    * is skipped (replay guard); id-level dedup across DIFFERENT batch
    * ids is the caller's (anti-join upstream if the source redelivers
    * rows across batch ids). */
  def start(docs: DataFrame, tableDir: String,
            checkpointLocation: String): (StreamingQuery, Handle) =
    run(docs, tableDir, checkpointLocation) { (batch, op) =>
      SnapshotStore.commitAppend(batch.sparkSession, tableDir, batch, op,
        reclaimGraceMs = 0L)
    }

  /** [[start]]'s UPSERT sibling: each micro-batch is a copy-on-write
    * [[SnapshotStore.merge]] keyed on `keyCols` — same-key rows in the
    * table are REPLACED by the batch, new keys append, and only files
    * intersecting the batch's key envelope are rewritten (the streaming
    * CDC-apply shape: pipe a change feed in, read a deduplicated table
    * out, time-travel to any batch boundary). Same replay guard and
    * crash contract as [[start]]; rows within ONE batch must be unique
    * on the key (dedup upstream, e.g. `ChangeFeed.dedupLatest`) —
    * across batches the merge IS the dedup. */
  def startUpsert(docs: DataFrame, tableDir: String,
                  checkpointLocation: String,
                  keyCols: Seq[String]): (StreamingQuery, Handle) =
    run(docs, tableDir, checkpointLocation) { (batch, op) =>
      SnapshotStore.merge(batch.sparkSession, tableDir, batch, keyCols,
        reclaimGraceMs = 0L, operation = op)
    }

  /** The replay guard every ingest path ([[start]], [[startUpsert]],
    * [[GatedSnapshotIngest]]) shares, so the `ingest-b<id>` tag format
    * cannot drift between them. Batch ids are MONOTONIC per checkpoint
    * and foreachBatch delivers them in order, so "already committed"
    * collapses to one comparison against the max committed ingest id —
    * which the store's checkpoint pointer carries, making the
    * query-start load O(1 + pointer lag) manifest reads instead of the
    * round-14 O(versions) scan (a micro-batch table holds one manifest
    * per trigger; at 100k commits the start-up scan was the last
    * O(commit-count) read in the ingest path). */
  private[streaming] final class ReplayGuard(initial: Option[Long]) {
    private[this] var max: Long = initial.getOrElse(-1L)
    def alreadyCommitted(batchId: Long): Boolean = batchId <= max
    def markCommitted(batchId: Long): Unit = max = math.max(max, batchId)
  }

  private[streaming] def replayGuard(
      spark: org.apache.spark.sql.SparkSession, dir: String): ReplayGuard =
    new ReplayGuard(SnapshotStore.maxIngestBatchId(spark, dir))

  private def run(docs: DataFrame, tableDir: String,
                  checkpointLocation: String)
                 (commit: (DataFrame, String) => Long): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[java.lang.Long](null)
    // the replay guard against foreachBatch's at-least-once redelivery:
    // only this (single-writer) query appends, so the one-time load plus
    // local marks stays exact.
    val committed = replayGuard(docs.sparkSession, tableDir)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!committed.alreadyCommitted(batchId)) {
          val v = commit(batch, f"ingest-b$batchId")
          committed.markCommitted(batchId)
          ref.set(v)
        }
      }
      .start()
    (query, new Handle(tableDir, ref))
  }
}
