package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Hamming-banded fingerprint index — the incremental near-dup
  * candidate generator for every BIT-FINGERPRINT modality in the engine:
  * SimHash documents, pHash images, audio segment hashes. Fingerprints
  * arrive as a stream of `(doc_id, simhash, sh_long)` rows (the upstream
  * fingerprint transforms — SimHash votes, dHash difference codes,
  * audio segmentation — are all in-row column expressions, so they
  * compose onto the streaming frame before this index sees it); each
  * micro-batch is bucketed ONCE through the same rotated-prefix tables
  * as the batch path, probed against the accumulated bucket index for
  * cross-batch candidates, self-joined for within-batch ones, and folded
  * in. Per-batch work ∝ batch buckets × matching occupancy — the indexed
  * corpus is never re-bucketed.
  *
  * Replay safety: a redelivered doc_id anti-joins away before bucketing,
  * so at-least-once delivery cannot create self-pairs or duplicate index
  * rows; accumulated pairs are stable under replay. Streamed-equals-batch:
  * the union of per-batch pairs over any batch split equals
  * [[Dedup.simhashPairsMultiTableFromFingerprints]] over the union corpus
  * (each unordered pair is discovered exactly once — when its later
  * element arrives, or in its shared batch).
  *
  * State: fingerprint, bucket, and pair tables are compact materialized
  * artifacts (the [[Dedup.materializeAndRelease]] contract); they grow
  * with the corpus, as any index must. A production deployment appends
  * the same three tables to bucketed storage (bucket by (tbl, bucket) /
  * doc_id) so each batch writes only its increment. */
object StreamingFingerprintIndex {

  final case class Index(fps: DataFrame, buckets: DataFrame, pairs: DataFrame)

  final class Handle private[StreamingFingerprintIndex] (
      ref: AtomicReference[Index]) {
    /** Accumulated candidate pairs (doc_a, doc_b, hamming), canonical
      * doc_a < doc_b, across all committed batches. */
    def candidatePairs: Option[DataFrame] = Option(ref.get()).map(_.pairs)
    /** doc_ids currently in the index. */
    def indexedDocs: Option[DataFrame] =
      Option(ref.get()).map(_.fps.select(col("doc_id")))
    /** The full three-table index after the most recent committed batch —
      * what a restart-durable deployment persists and feeds back to
      * [[StreamingFingerprintIndex.start]] as `initialIndex`. */
    def currentIndex: Option[Index] = Option(ref.get())
  }

  /** Start maintaining the index over a streaming `(doc_id, simhash,
    * sh_long)` frame. `initialIndex` seeds recovery from persisted
    * (fps, buckets, pairs) tables — persist after each batch (or on
    * shutdown), then resume from the SAME checkpoint location with the
    * persisted index; the checkpoint skips already-committed batches and
    * the seed supplies their accumulated state. */
  def start(fingerprints: DataFrame, checkpointLocation: String, bits: Int,
            prefixBits: Int, maxHamming: Int, nTables: Int,
            initialIndex: Option[Index] = None): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[Index](initialIndex.orNull)
    val query = fingerprints.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prev = Option(ref.get())
        val inc = Dedup.fingerprintIncrement(batch, prev.map(_.fps),
          prev.map(_.buckets), bits, prefixBits, maxHamming, nTables)
        val next = prev match {
          case None => Index(inc.fps, inc.buckets, inc.newPairs)
          case Some(p) =>
            Index(
              Dedup.materializeAndRelease(p.fps.unionByName(inc.fps)),
              Dedup.materializeAndRelease(p.buckets.unionByName(inc.buckets)),
              Dedup.materializeAndRelease(p.pairs.unionByName(inc.newPairs)))
        }
        ref.set(next)
      }
      .start()
    (query, new Handle(ref))
  }
}
