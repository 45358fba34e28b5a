package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming exact-substring dedup ([[Dedup.exactSpanDedup]]'s incremental
  * half): documents arrive as a stream; each micro-batch is gram-scanned
  * once, cleaned against the standing gram index (an indexed gram cuts
  * every new occurrence — by definition a later one), and the index grows
  * by the batch's distinct grams. The indexed corpus is never re-scanned.
  *
  * Because the policy keeps FIRST occurrences, an emitted document's
  * cleaned text is final the moment it arrives — so with documents
  * arriving in (doc_id) order the accumulated cleaned table equals the
  * batch [[Dedup.exactSpanDedup]] over the union corpus EXACTLY at every
  * fold point (the spec's invariant). Out-of-order arrival keeps the same
  * covering guarantee (every duplicated ≥L-word span loses all but one
  * occurrence); only WHICH occurrence survives follows arrival order
  * instead of doc_id order.
  *
  * Replay safety: a redelivered doc_id is dropped before scanning, so
  * at-least-once delivery cannot re-clean or double-count a document.
  *
  * State: one row per distinct gram plus the cleaned/docs tables — the
  * [[Dedup.materializeAndRelease]] contract; a production deployment
  * appends to storage bucketed by gram hash / doc_id. */
object StreamingSpanDedup {

  final case class State(cleaned: DataFrame, grams: DataFrame, docs: DataFrame)

  final class Handle private[StreamingSpanDedup] (
      ref: AtomicReference[State]) {
    /** Accumulated cleaned corpus (doc_id, n_tokens, n_removed,
      * clean_text) across all committed batches. */
    def cleaned: Option[DataFrame] = Option(ref.get()).map(_.cleaned)
    /** doc_ids currently represented in the index. */
    def indexedDocs: Option[DataFrame] = Option(ref.get()).map(_.docs)
    /** The full state after the most recent committed batch — what a
      * restart-durable deployment persists and feeds back to
      * [[StreamingSpanDedup.start]] as `initialState`. */
    def currentState: Option[State] = Option(ref.get())
  }

  /** Start cleaning a streaming `(doc_id, text)` frame. `initialState`
    * seeds recovery from persisted tables — resume from the SAME
    * checkpoint location with the persisted state and the resumed run
    * equals the uninterrupted one. */
  def start(docs: DataFrame, checkpointLocation: String,
            spanWords: Int = 8,
            initialState: Option[State] = None): (StreamingQuery, Handle) = {
    val ref = new AtomicReference[State](initialState.orNull)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prev = Option(ref.get())
        val inc = Dedup.exactSpanDedupIncrement(batch, "doc_id", "text",
          prev.map(_.grams), prev.map(_.docs), spanWords)
        val next = prev match {
          case None => State(inc.cleaned, inc.gramIndex, inc.docIds)
          case Some(p) => State(
            Dedup.materializeAndRelease(p.cleaned.unionByName(inc.cleaned)),
            inc.gramIndex, inc.docIds)
        }
        ref.set(next)
      }
      .start()
    (query, new Handle(ref))
  }
}
