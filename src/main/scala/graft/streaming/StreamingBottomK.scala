package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming bottom-k resemblance sketches — the maintained form of
  * `ExtQueries.eBottomkResemblance`: as documents stream in, each
  * source's k smallest shingle hashes are kept current, so pairwise
  * source-overlap ESTIMATES are always available without re-reading the
  * corpus (Broder 1997: the bottom-k of a set union is the bottom-k of
  * the sketch union, so the fold below loses nothing).
  *
  * State is ≤ k rows per source FOREVER. The fold (union + re-cut) is
  * ASSOCIATIVE and IDEMPOTENT — bottom-k over sets dedups on the hash —
  * so at-least-once redelivery needs no batch-id cursor at all: a
  * replayed document contributes the identical (source, hash) rows and
  * the cut collapses them. Streamed state provably equals
  * [[batchSketch]] of everything ingested, at every fold point.
  *
  * Restart: persist [[Handle.currentSketch]] and pass it back as
  * `initialState` (the [[StreamingWeightedSample]] recovery contract). */
object StreamingBottomK {

  /** The batch-equivalent cut — one definition shared by the fold, the
    * estimates, and the streamed==batch spec: per-source distinct
    * shingle hashes, k smallest kept, `(source, h, sh)` with h = the
    * 56-bit hash folded to `mod` (`sh` carries the unfolded hash as the
    * deterministic tie-break). */
  def batchSketch(docs: DataFrame, k: Int, mod: Long,
                  idCol: String = "doc_id", textCol: String = "text",
                  srcCol: String = "source", shingleWidth: Int = 3): DataFrame = {
    val bases = Dedup.shingleBases(docs, idCol, textCol, shingleWidth)
      .select(col("doc_id"), col("b1").as("sh"))
    val withSrc = bases
      .join(docs.select(col(idCol).as("doc_id"), col(srcCol).as("source")),
        Seq("doc_id"))
      .select(col("source"), col("sh")).dropDuplicates("source", "sh")
      .withColumn("h", col("sh") % mod)
    graft.operators.GroupedTopK.topKPerKey(
        withSrc.withColumn("neg_h", -col("h")), "source", "neg_h", "sh", k)
      .select(col("source"), (-col("score")).cast("long").as("h"),
        col("sh"))
  }

  /** Pairwise resemblance estimates off a sketch frame: for every source
    * pair, the fraction of the union-sketch's k smallest hashes present
    * in both sketches. Sketch-sized work only — the per-pair ranking
    * windows over ≤ 2k rows. */
  def estimates(sk: DataFrame, k: Int): DataFrame = {
    val srcList = sk.select(col("source")).distinct()
    val pairs = srcList.select(col("source").as("source_a"))
      .crossJoin(srcList.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    // explode each pair into its member rows: a HASH equi-join on the
    // source (an OR-condition would plan a nested loop, quadratic in
    // sources)
    val pairRows = broadcast(pairs.select(col("source_a"), col("source_b"),
        explode(array(col("source_a"), col("source_b"))).as("s")))
      .join(sk.select(col("source").as("s"), col("h")), Seq("s"))
    val w = Window.partitionBy("source_a", "source_b").orderBy(col("h"))
    pairRows.groupBy("source_a", "source_b", "h")
      .agg(countDistinct(col("s")).as("ns"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
      .groupBy("source_a", "source_b")
      .agg(sum(when(col("ns") === 2, 1L).otherwise(0L)).as("n_both"),
        count(lit(1)).as("n_top"))
      .select(col("source_a"), col("source_b"),
        round(col("n_both") / col("n_top").cast("double"), 6).as("est_jaccard"))
      .orderBy("source_a", "source_b")
  }

  final class Handle private[StreamingBottomK] (
      ref: AtomicReference[DataFrame], k: Int) {
    /** The maintained ≤ k-rows-per-source sketch (what a restart persists). */
    def currentSketch: Option[DataFrame] = Option(ref.get())
    /** Pairwise source-overlap estimates under the CURRENT sketches. */
    def resemblance(): Option[DataFrame] =
      currentSketch.map(estimates(_, k))
  }

  def start(docs: DataFrame, checkpointLocation: String, k: Int, mod: Long,
            idCol: String = "doc_id", textCol: String = "text",
            srcCol: String = "source", shingleWidth: Int = 3,
            initialState: Option[DataFrame] = None): (StreamingQuery, Handle) = {
    require(k >= 1, "sketch size must be >= 1")
    require(mod > 0 && mod <= (1L << 52), "mod must keep doubles exact")
    val ref = new AtomicReference[DataFrame](initialState.orNull)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batchSketch(batch, k, mod, idCol, textCol, srcCol, shingleWidth)
        val unioned = Option(ref.get()).fold(bs)(_.unionByName(bs))
          // set semantics make the fold idempotent: a replayed doc's rows
          // are byte-identical and collapse here
          .dropDuplicates("source", "sh")
          .withColumn("neg_h", -col("h"))
        val cut = graft.operators.GroupedTopK.topKPerKey(
            unioned, "source", "neg_h", "sh", k)
          .select(col("source"), (-col("score")).cast("long").as("h"),
            col("sh"))
        // materialize the tiny state eagerly — the fold must not chain
        // lazily across the stream's lifetime
        ref.set(Dedup.materializeAndRelease(cut))
      }
      .start()
    (query, new Handle(ref, k))
  }
}
