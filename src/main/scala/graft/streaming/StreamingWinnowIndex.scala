package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dedup.{Dedup, Winnowing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming winnowing-index maintenance — the incremental half of the
  * copied-span detector ([[graft.dedup.Winnowing]]): documents arrive as
  * a stream, each micro-batch is fingerprinted ONCE (in-row, native
  * expression), probed against the accumulated fingerprint index for
  * cross-batch matches, self-joined for within-batch matches, then folded
  * into the index. The already-indexed corpus is never re-fingerprinted.
  *
  * Because fingerprints are a pure function of each document's own text,
  * the accumulated match table provably equals the batch
  * [[Winnowing.matchesFromFingerprints]] over the union corpus at every
  * fold point (no df cap in the stream — see [[Winnowing.winnowIncrement]];
  * cap downstream where the full index is in hand).
  *
  * Replay safety: a redelivered doc_id is dropped before fingerprinting
  * (anti-join against the index), so at-least-once delivery cannot create
  * self-matches or duplicate index rows.
  *
  * State: the fingerprint and match tables are compact materialized
  * artifacts (the [[Dedup.materializeAndRelease]] contract); they grow
  * with the corpus, as any index must. A production deployment appends
  * both to storage bucketed by `h` / `doc_id` so each batch writes only
  * its increment. */
object StreamingWinnowIndex {

  final case class Index(fps: DataFrame, matches: DataFrame)

  final class Handle private[StreamingWinnowIndex] (
      ref: AtomicReference[Index]) {
    /** Accumulated match pairs (doc_a, doc_b, n_shared), canonical
      * doc_a < doc_b, across all committed batches. */
    def matches: Option[DataFrame] = Option(ref.get()).map(_.matches)
    /** doc_ids currently in the index. */
    def indexedDocs: Option[DataFrame] =
      Option(ref.get()).map(_.fps.select(col("doc_id")).distinct())
    /** The full two-table index after the most recent committed batch —
      * what a restart-durable deployment persists and feeds back to
      * [[StreamingWinnowIndex.start]] as `initialIndex`. */
    def currentIndex: Option[Index] = Option(ref.get())
  }

  /** Start maintaining the index over a streaming `(doc_id, text)` frame.
    * `initialIndex` seeds recovery from persisted (fps, matches) tables —
    * resume from the SAME checkpoint location with the persisted index and
    * the resumed run equals the uninterrupted one (the checkpoint skips
    * already-committed batches; the seed supplies their accumulated
    * state). */
  def start(docs: DataFrame, checkpointLocation: String,
            shingleWidth: Int = 3, window: Int = 4, minShared: Long = 2L,
            initialIndex: Option[Index] = None): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[Index](initialIndex.orNull)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prev = Option(ref.get())
        val inc = Winnowing.winnowIncrement(batch, "doc_id", "text",
          prev.map(_.fps), shingleWidth, window, minShared)
        val next = prev match {
          case None => Index(inc.fps, inc.newMatches)
          case Some(p) => Index(
            Dedup.materializeAndRelease(p.fps.unionByName(inc.fps)),
            Dedup.materializeAndRelease(p.matches.unionByName(inc.newMatches)))
        }
        ref.set(next)
      }
      .start()
    (query, new Handle(ref))
  }
}
