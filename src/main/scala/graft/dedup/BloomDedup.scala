package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Incremental corpus deduplication with a Bloom-filter prefilter — the
  * 100 TB shape for "is this new document already in the corpus": the
  * existing corpus aggregates ONCE into a compact bit array (a custom
  * typed `Aggregator`, the engine's real UDAF surface), and each new batch
  * probes it with pure column expressions. Rows failing the probe are
  * DEFINITELY fresh (Bloom filters have no false negatives) and skip the
  * join entirely; only the small might-be-duplicate remainder — false
  * positives plus true duplicates — pays the exact anti-join. The final
  * result is therefore EXACTLY the plain anti-join's (oracle-checkable),
  * at a fraction of its shuffle.
  *
  * Hashing: positions come from Kirsch-Mitzenmacher double hashing over
  * two independent xxhash64 values, each folded into [0, 2^31) so
  * `g1 + i*g2` stays far from 64-bit overflow (ANSI mode would throw);
  * insert (JVM loop) and probe (column expressions) use the IDENTICAL
  * formula, which is what guarantees no false negatives.
  *
  * Scale note: the aggregated bit array returns to the driver and probes
  * as a literal — right up to ~10^8 bits (tens of MB broadcast, ~10^7
  * corpus keys at 1% FP). Beyond that, ship the array as a broadcast
  * variable probed in `mapPartitions`, or shard the filter by key range;
  * the aggregation shape (map-side partial blooms OR-merged) is unchanged.
  */
object BloomDedup {

  private val Fold = 1L << 31

  /** The two folded hash columns for a key expression. */
  def hashPair(key: Column): (Column, Column) =
    (pmod(xxhash64(key), lit(Fold)), pmod(xxhash64(key, lit(1)), lit(Fold)))

  /** Typed Bloom aggregator: buffer and output are the packed bit words.
    * Commutative + associative via bitwise OR, so Spark combines partial
    * blooms map-side — the shuffle carries one array per partition. */
  final class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(numBits > 0 && numHashes > 0)

    override def zero: Array[Long] = new Array[Long]((numBits + 63) / 64)

    override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      val (g1, g2) = in
      var i = 0
      while (i < numHashes) {
        val pos = ((g1 + i * g2) % numBits).toInt // g < 2^31: no overflow
        b(pos >> 6) |= (1L << (pos & 63))
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate the corpus' key column into a Bloom bit array (one driver
    * row — the "index build" of the incremental-dedup pipeline). */
  def buildBloom(corpus: DataFrame, key: Column,
                 numBits: Int, numHashes: Int): Array[Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (g1, g2) = hashPair(key)
    corpus.select(g1.as("g1"), g2.as("g2")).as[(Long, Long)]
      .select(new BloomAgg(numBits, numHashes).toColumn)
      .collect().headOption.getOrElse(new Array[Long]((numBits + 63) / 64))
  }

  /** Bloom probe: true when every probed bit is set (i.e. the key MIGHT
    * be in the corpus; false = definitely fresh). The bit test itself is
    * the native codegen [[graft.plans.BloomMightContain]]; only the two
    * base hashes are composed Columns. */
  def mightContain(bits: Array[Long], numBits: Int, numHashes: Int)
                  (key: Column): Column = {
    val (g1, g2) = hashPair(key)
    graft.plans.BloomExpression.bloomMightContain(g1, g2, bits, numBits, numHashes)
  }

  /** Power-of-two bit count giving ~10 bits/key (≤1% FP at k=7), floored
    * at 2^16 and capped at 2^27 (16 MiB literal — the practical ceiling
    * for a driver-side probe constant; shard or broadcast beyond that). */
  def sizeBits(corpusKeys: Long): Int = {
    val want = math.max(1L << 16, corpusKeys * 10)
    var bits = 1L << 16
    while (bits < want && bits < (1L << 27)) bits <<= 1
    bits.toInt
  }

  /** New documents NOT already in the corpus (by exact key equality):
    * Bloom-reject rows pass through join-free; only might-contain rows pay
    * the exact `left_anti` confirm. Provably equal to the plain anti-join.
    * `numBits <= 0` (the default) auto-sizes from a corpus count — one
    * extra cheap job that keeps the FP rate ~1% at any corpus scale
    * instead of silently degrading to join-everything. */
  def freshDocs(newDocs: DataFrame, corpus: DataFrame, key: Column,
                numBits: Int = -1, numHashes: Int = 7): DataFrame = {
    val bits = if (numBits > 0) numBits else sizeBits(corpus.count())
    freshDocsSized(newDocs, corpus, key, bits, numHashes)
  }

  private def freshDocsSized(newDocs: DataFrame, corpus: DataFrame,
                             key: Column, numBits: Int, numHashes: Int): DataFrame = {
    val bloom = buildBloom(corpus, key, numBits, numHashes)
    val hit = mightContain(bloom, numBits, numHashes)(key)
    val definitelyFresh = newDocs.filter(!hit)
    val confirmed = newDocs.filter(hit)
      .join(corpus.select(key.as("__k")).distinct(),
        key === col("__k"), "left_anti")
    definitelyFresh.unionByName(confirmed)
  }
}
