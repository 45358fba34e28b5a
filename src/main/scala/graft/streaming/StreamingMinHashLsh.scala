package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MinHash-LSH index maintenance — the incremental half of the
  * near-dup candidate generator: documents arrive as a stream, each
  * micro-batch is shingled/signed ONCE, probed against the accumulated
  * band index for cross-batch candidates, self-joined for within-batch
  * candidates, and then folded into the index. Per-batch work scales with
  * the batch's bands × matching bucket occupancy — the already-indexed
  * corpus is never re-shingled.
  *
  * Composes with [[StreamingConnectedComponents]] into the full streaming
  * dedup path: docs stream → candidate-pair stream → maintained cluster
  * labels.
  *
  * Replay safety: a redelivered doc_id is dropped before signing (anti-join
  * against the index), so at-least-once delivery cannot create self-pairs
  * or duplicate index rows; accumulated pairs are stable under replay.
  *
  * State: the signature, band, and pair tables are compact materialized
  * artifacts (localCheckpoint / reliable checkpoint — the
  * [[Dedup.materializeAndRelease]] contract); they grow with the corpus,
  * as any index must. This per-batch re-materialization is the local
  * form; a production deployment appends the same three tables to
  * bucketed storage (bucket by band_key / doc_id) so each batch writes
  * only its increment. */
object StreamingMinHashLsh {

  final case class Index(sigs: DataFrame, bands: DataFrame, pairs: DataFrame)

  final class Handle private[StreamingMinHashLsh] (
      ref: AtomicReference[Index]) {
    /** Accumulated candidate pairs (doc_a, doc_b, est_jaccard), canonical
      * doc_a < doc_b, across all committed batches. */
    def candidatePairs: Option[DataFrame] = Option(ref.get()).map(_.pairs)
    /** doc_ids currently in the index. */
    def indexedDocs: Option[DataFrame] =
      Option(ref.get()).map(_.sigs.select(col("doc_id")))
    /** The full three-table index after the most recent committed batch —
      * what a restart-durable deployment persists and feeds back to
      * [[StreamingMinHashLsh.start]] as `initialIndex`. */
    def currentIndex: Option[Index] = Option(ref.get())
  }

  /** Start maintaining the index over a streaming `(doc_id, text)` frame.
    * `initialIndex` seeds recovery from persisted (sigs, bands, pairs)
    * tables — the restart path: persist the three tables after each batch
    * (or on shutdown), then resume from the SAME checkpoint location with
    * the persisted index; the checkpoint skips already-committed batches
    * and the seed supplies their accumulated state, so the resumed run
    * equals the uninterrupted one (exercised by the resume spec). */
  def start(docs: DataFrame, checkpointLocation: String, k: Int = 12,
            shingleWidth: Int = 3, bandRows: Int = 2,
            minEst: Double = 0.0,
            initialIndex: Option[Index] = None): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[Index](initialIndex.orNull)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prev = Option(ref.get())
        // the batch primitive: replay guard, shingle/sign the batch only,
        // within ∪ cross candidates, estimates against the union sigs
        val inc = Dedup.minhashIncrement(batch, "doc_id", "text",
          prev.map(_.sigs), prev.map(_.bands), k, shingleWidth, bandRows,
          minEst)
        val next = prev match {
          case None => Index(inc.sigs, inc.bands, inc.newPairs)
          case Some(p) =>
            Index(
              Dedup.materializeAndRelease(p.sigs.unionByName(inc.sigs)),
              Dedup.materializeAndRelease(p.bands.unionByName(inc.bands)),
              Dedup.materializeAndRelease(p.pairs.unionByName(inc.newPairs)))
        }
        ref.set(next)
      }
      .start()
    (query, new Handle(ref))
  }
}
