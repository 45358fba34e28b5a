package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sorted-neighborhood blocking — the incremental form of the
  * merge/purge candidate generator (`ExtQueries.eSortedNeighborhood`): as
  * documents arrive, each batch re-sorts ONLY the blocks it touches and
  * compares the new rows against their sort-adjacent neighbors there.
  * Work per batch ∝ occupancy of the AFFECTED blocks, never the corpus;
  * untouched blocks are not read at all (the blocks frame semi-joins the
  * standing index down to the touched slice).
  *
  * Candidate semantics are the standard incremental-SN contract:
  * accumulated pairs = every pair that was sort-adjacent at SOME arrival
  * point — a SUPERSET of the one-shot batch run over the final corpus
  * (an arriving doc can break an old adjacency but never retracts the
  * candidate it already produced; candidates are monotone). The spec
  * proves the superset containment at every fold point.
  *
  * Replay safety: a redelivered doc_id anti-joins against the standing
  * index and contributes nothing. Restart: persist
  * [[Handle.currentIndex]] + [[Handle.currentPairs]] and seed them back. */
object StreamingSortedNeighborhood {

  /** Blocked projection shared by the fold and the batch reference:
    * (block, pfx, doc_id). */
  def blocked(docs: DataFrame, blockChars: Int, prefixChars: Int,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      substring(trim(col(textCol)), 1, prefixChars).as("pfx"),
      substring(trim(col(textCol)), 1, blockChars).as("block"))

  /** One-shot sorted-neighborhood candidates over a blocked frame — the
    * batch reference the streamed accumulation must contain. */
  def candidates(blockedDf: DataFrame, maxDist: Int): DataFrame = {
    val w = Window.partitionBy("block").orderBy(col("pfx"), col("doc_id"))
    blockedDf
      .select(col("block"), col("doc_id"), col("pfx"),
        lag(col("doc_id"), 1).over(w).as("prev_id"),
        lag(col("pfx"), 1).over(w).as("prev_pfx"))
      .filter(col("prev_id").isNotNull)
      .withColumn("edit_dist", levenshtein(col("pfx"), col("prev_pfx")).cast("long"))
      .filter(col("edit_dist") <= maxDist)
      .select(least(col("prev_id"), col("doc_id")).as("doc_a"),
        greatest(col("prev_id"), col("doc_id")).as("doc_b"),
        col("block"), col("edit_dist"))
  }

  final class Handle private[StreamingSortedNeighborhood] (
      idxRef: AtomicReference[DataFrame], prRef: AtomicReference[DataFrame]) {
    /** The standing blocked index (what a restart persists). */
    def currentIndex: Option[DataFrame] = Option(idxRef.get())
    /** Accumulated candidate pairs (doc_a, doc_b, block, edit_dist). */
    def currentPairs: Option[DataFrame] = Option(prRef.get())
  }

  def start(docs: DataFrame, checkpointLocation: String,
            blockChars: Int = 8, prefixChars: Int = 120, maxDist: Int = 40,
            idCol: String = "doc_id", textCol: String = "text",
            initialIndex: Option[DataFrame] = None,
            initialPairs: Option[DataFrame] = None): (StreamingQuery, Handle) = {
    val idxRef = new AtomicReference[DataFrame](initialIndex.orNull)
    val prRef = new AtomicReference[DataFrame](initialPairs.orNull)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fresh0 = blocked(batch, blockChars, prefixChars, idCol, textCol)
          .dropDuplicates("doc_id")
        // replay guard: an already-indexed doc contributes nothing
        val fresh = Option(idxRef.get()).fold(fresh0)(idx =>
          fresh0.join(idx.select(col("doc_id")), Seq("doc_id"), "left_anti"))
        // the increment touches ONLY its own blocks: the standing index
        // semi-joins down to the affected slice before the per-block sort
        val touched = fresh.select(col("block")).distinct()
        val slice = Option(idxRef.get()).fold(fresh)(idx =>
          idx.join(broadcast(touched), Seq("block"), "left_semi")
            .unionByName(fresh))
        // pairs INVOLVING a new doc: adjacency among old rows existed
        // before and is already accumulated (or was never a candidate)
        val freshIds = fresh.select(col("doc_id"))
        val cand = candidates(slice, maxDist)
        val newPairs = cand
          .join(broadcast(freshIds.select(col("doc_id").as("doc_a"))),
            Seq("doc_a"), "left_semi")
          .unionByName(cand
            .join(broadcast(freshIds.select(col("doc_id").as("doc_b"))),
              Seq("doc_b"), "left_semi"))
          .dropDuplicates("doc_a", "doc_b")
        val accPairs = Option(prRef.get()).fold(newPairs)(
            _.unionByName(newPairs))
          .dropDuplicates("doc_a", "doc_b")
        val accIdx = Option(idxRef.get()).fold(fresh)(_.unionByName(fresh))
        // materialize both states eagerly — the fold must not chain
        // lazily across the stream's lifetime
        prRef.set(Dedup.materializeAndRelease(accPairs))
        idxRef.set(Dedup.materializeAndRelease(accIdx))
      }
      .start()
    (query, new Handle(idxRef, prRef))
  }
}
