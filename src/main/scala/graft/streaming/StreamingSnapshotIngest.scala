package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.storage.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest INTO the transactional snapshot store — the piece
  * that turns micro-batch arrival into readable-as-of table versions:
  * each committed micro-batch becomes ONE atomic manifest commit holding
  * the accumulated corpus (prior version ∪ batch), so any downstream
  * reader can time-travel to "the corpus as of batch N" while ingestion
  * keeps running, and maintenance ([[SnapshotStore.compact]] /
  * `cluster`) interleaves through the same commit protocol without
  * stopping the stream.
  *
  * Exactly-once versioning without a two-phase dance: the streaming
  * checkpoint makes batch DELIVERY exactly-once (a replayed batch id is
  * not re-delivered after restart), and the store's manifest rename makes
  * each COMMIT atomic. The remaining torn window — data files written,
  * manifest missing, then a crash — is exactly the store's torn-commit
  * contract: invisible to every reader, refused (then vacuumed) on the
  * next commit attempt, so the stream either resumes at the previous
  * version or the operator vacuums and replays the batch from the
  * checkpoint. Nothing half-committed is ever readable (spec-proven in
  * `SnapshotStoreSpec`; the streamed==batch fold is
  * `StreamingSnapshotIngestSpec`'s business).
  *
  * Scale shape: each commit is an APPEND ([[SnapshotStore.commitAppend]]):
  * the new manifest carries the prior version's immutable files and only
  * the batch's bytes hit disk — commit cost O(batch), never O(corpus),
  * and history is never rewritten. Small files accumulate at exactly the
  * rate micro-batches arrive, which is what the interleaved
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
    * accumulated corpus — dedup/idempotence across redelivery is the
    * checkpoint's job (exactly-once per batch id), id-level replay the
    * caller's (anti-join upstream if the source redelivers rows across
    * batch ids). */
  def start(docs: DataFrame, tableDir: String,
            checkpointLocation: String): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[java.lang.Long](null)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val v = SnapshotStore.commitAppend(batch.sparkSession, tableDir,
          batch, f"ingest-b$batchId")
        ref.set(v)
      }
      .start()
    (query, new Handle(tableDir, ref))
  }
}
