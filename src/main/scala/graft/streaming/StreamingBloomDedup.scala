package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.util.hashing.MurmurHash3

/** Cross-batch FIRST-OCCURRENCE dedup over an unbounded stream with
  * BOUNDED state: each key emits at most once for the stream's lifetime.
  *
  * Exact first-occurrence dedup on an unbounded key domain needs the full
  * seen-key set in state (`dropDuplicates` — O(keys), growing forever, or
  * watermark-evicted and therefore forgetting). This operator instead keeps
  * one Bloom filter per SHARD of the key space in the engine's keyed state
  * store: `nShards * numBits/8` bytes of state, FIXED for the stream's
  * lifetime, no watermark required.
  *
  * The trade (the standard Bloom one, stated precisely):
  *  - a key already emitted is ALWAYS suppressed on redelivery — no false
  *    negatives, duplicates can never leak through;
  *  - a FRESH key can be wrongly suppressed with probability
  *    ≈ (1 − e^(−k·n/m))^k (n = keys inserted into its shard so far,
  *    m = numBits, k = numHashes) — ~0.8% at n = m/10. Size `numBits` for
  *    the expected per-shard key cardinality; suppression-sensitive
  *    pipelines should prefer exact state while it fits.
  *
  * Sharding: groups are `murmur(key) mod nShards`, so state-store
  * parallelism scales with nShards (each shard's batch slice processes
  * serially; shards spread across executors) and each shard's filter sees
  * only its share of keys. nShards scales with the cluster, not the data.
  *
  * Replay determinism: a checkpoint replay can reorder rows within a
  * batch, and Bloom emission is order-sensitive (an earlier insert can
  * flip a later probe). Rows are therefore canonically sorted by
  * (key, tieBreak) before probing — emission is a pure function of the
  * batch CONTENTS, and for same-key ties the tieBreak-least value wins.
  */
object StreamingBloomDedup {

  case class Event[V](key: String, value: V)

  private def basePair(key: String): (Long, Long) = (
    (MurmurHash3.stringHash(key, 0x9747b28c) & 0x7fffffffL),
    (MurmurHash3.stringHash(key, 0x5bd1e995) & 0x7fffffffL))

  private def probeAndSet(bloom: Array[Long], numBits: Int, numHashes: Int,
                          key: String): Boolean = {
    val (g1, g2) = basePair(key)
    var seen = true
    var i = 0
    while (i < numHashes) {
      val pos = ((g1 + i * g2) % numBits).toInt // g < 2^31: no overflow
      if ((bloom(pos >> 6) & (1L << (pos & 63))) == 0L) {
        seen = false
        bloom(pos >> 6) |= (1L << (pos & 63))
      }
      i += 1
    }
    seen
  }

  /** Emit the first occurrence of each key; suppress every later one.
    * Works on a streaming Dataset (micro-batch state) and identically on a
    * batch Dataset (single pass). */
  def firstOccurrence[V](ds: Dataset[Event[V]], nShards: Int = 64,
                         numBits: Int = 1 << 20, numHashes: Int = 7,
                         tieBreak: Event[V] => String = (e: Event[V]) => String.valueOf(e.value))(
      implicit ev: Encoder[Event[V]]): Dataset[Event[V]] = {
    require(nShards >= 1 && numBits > 0 && numHashes > 0)
    require(numBits % 64 == 0, "numBits must pack into whole words")
    ds.groupByKey(e => Math.floorMod(MurmurHash3.stringHash(e.key), nShards))(Encoders.scalaInt)
      .flatMapGroupsWithState[Array[Long], Event[V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[Event[V]], state: GroupState[Array[Long]]) =>
          val bloom = state.getOption.getOrElse(new Array[Long](numBits / 64))
          // materialize BEFORE state.update: the state store may serialize
          // the array at update time, and a lazily-drained iterator would
          // mutate it afterwards (losing this batch's inserts)
          val kept = rows.toSeq.sortBy(e => (e.key, tieBreak(e)))
            .filter(e => !probeAndSet(bloom, numBits, numHashes, e.key))
            .toVector
          state.update(bloom)
          kept.iterator
      }(ExpressionEncoder[Array[Long]](), ev)
  }
}
