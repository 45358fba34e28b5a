package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic mergeable quantile summary — the multi-level compaction
  * scheme of Munro/Paterson (1980) as used by the MRL/KLL family, with
  * DETERMINISTIC alternating compaction instead of coin flips: level `i`
  * holds ≤ k sorted values each standing for 2^i inputs; a full level
  * sorts, keeps every second element (alternating the kept parity between
  * compactions to cancel rank bias), and promotes them one level up.
  *
  * This is the missing member of the engine's sketch family (Bloom =
  * membership, count-min = frequencies, HLL = cardinality): a bounded
  * O(k · log(n/k)) summary answering ANY quantile to ±ε·n rank error
  * (ε ≈ log₂(n/k)/k), mergeable associatively — so Spark combines partial
  * sketches map-side and the shuffle carries one small state per
  * partition, never the values. No RNG anywhere: the summary is a pure
  * function of the input multiset and its partition layout (same
  * partition-layout caveat as every compaction sketch, including Spark's
  * own approx_percentile — hence a rows-only graded query, like the HLL
  * row).
  *
  * Use the batch [[agg]] with `groupBy().agg(...)`, probe with
  * [[quantile]]; the streaming form keeps the same state in a running
  * aggregation ([[graft.streaming.StreamingQuantiles]]). */
object QuantileSketch {

  /** Aggregation state: a bounded level-0 insert buffer plus the sorted
    * higher levels (`higher(i)` weights 2^(i+1) per element). */
  case class QsBuf(buf0: Array[Double], n0: Int, flip: Int,
                   higher: Array[Array[Double]])

  /** The finished summary: `levels(i)` sorted, each element weighing 2^i. */
  type Summary = Array[Array[Double]]

  private def compactArr(sorted: Array[Double], flip: Int): Array[Double] = {
    val out = new Array[Double](sorted.length / 2)
    var i = flip & 1
    var j = 0
    while (j < out.length) { out(j) = sorted(i); i += 2; j += 1 }
    out
  }

  /** Merge `values` (sorted) into level `i`, compacting any overfull level
    * upward. Returns the new higher-levels array and the flip counter. */
  private def promote(higher: Array[Array[Double]], values: Array[Double],
                      level: Int, k: Int, flip0: Int): (Array[Array[Double]], Int) = {
    var levels = higher
    var carry = values
    var i = level
    var flip = flip0
    while (carry.length > 0) {
      while (i >= levels.length) levels = levels :+ Array.emptyDoubleArray
      val merged = (levels(i) ++ carry).sorted
      if (merged.length <= k) {
        levels = levels.updated(i, merged)
        carry = Array.emptyDoubleArray
      } else {
        // keep a ≤ k remainder at this level, push the compacted half up
        val keep = merged.length - (merged.length / 2) * 2 // 0 or 1 leftover
        val even = merged.take(merged.length - keep)
        val rest = merged.drop(merged.length - keep)
        levels = levels.updated(i, rest)
        carry = compactArr(even, flip)
        flip += 1
        i += 1
      }
    }
    (levels, flip)
  }

  final class QsAgg(k: Int) extends Aggregator[Double, QsBuf, Summary] {
    require(k >= 4 && k % 2 == 0, "k must be even and >= 4")

    override def zero: QsBuf =
      QsBuf(new Array[Double](k), 0, 0, Array.empty)

    override def reduce(b: QsBuf, x: Double): QsBuf = {
      val base = if (b.n0 == k) flush(b) else b
      base.buf0(base.n0) = x
      base.copy(n0 = base.n0 + 1)
    }

    // only called with a FULL buffer (n0 == k, k even): sort, halve, promote
    private def flush(b: QsBuf): QsBuf = {
      val filled = b.buf0.clone()
      java.util.Arrays.sort(filled)
      val (levels, flip) = promote(b.higher, compactArr(filled, b.flip),
        0, k, b.flip + 1)
      QsBuf(new Array[Double](k), 0, flip, levels)
    }

    override def merge(a: QsBuf, b: QsBuf): QsBuf = {
      // fold b's level-0 raw values into a, then merge levels pairwise
      var acc = a
      var i = 0
      while (i < b.n0) { acc = reduce(acc, b.buf0(i)); i += 1 }
      var levels = acc.higher
      var flip = acc.flip
      var lvl = 0
      while (lvl < b.higher.length) {
        val (nl, nf) = promote(levels, b.higher(lvl).sorted, lvl, k, flip)
        levels = nl; flip = nf
        lvl += 1
      }
      acc.copy(higher = levels, flip = flip)
    }

    override def finish(b: QsBuf): Summary = {
      val l0 = java.util.Arrays.copyOf(b.buf0, b.n0)
      java.util.Arrays.sort(l0)
      l0 +: b.higher.map(_.sorted)
    }

    override def bufferEncoder: Encoder[QsBuf] = ExpressionEncoder[QsBuf]()
    override def outputEncoder: Encoder[Summary] = ExpressionEncoder[Summary]()
  }

  /** Column form for `groupBy(...).agg(...)` over a double column. */
  def agg(k: Int = 128): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new QsAgg(k))

  /** Probe a finished summary: smallest value whose cumulative weight
    * reaches q of the total (q ∈ [0, 1]). */
  def quantile(summary: Summary, q: Double): Double = {
    val weighted = summary.zipWithIndex.flatMap { case (vals, lvl) =>
      val w = 1L << lvl
      vals.map(v => (v, w))
    }.sortBy(_._1)
    require(weighted.nonEmpty, "empty sketch")
    val total = weighted.map(_._2).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var i = 0
    while (i < weighted.length) {
      cum += weighted(i)._2
      if (cum >= target) return weighted(i)._1
      i += 1
    }
    weighted.last._1
  }

  /** Total weight summarized (= number of inputs). */
  def count(summary: Summary): Long =
    summary.zipWithIndex.map { case (vals, lvl) => vals.length.toLong << lvl }.sum

  /** Probe as a Column over a sketch column (driver-free scoring of many
    * grouped sketches): expand to (value, weight) and take the weighted
    * quantile with pure column expressions. */
  def quantileCol(sketch: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    // rows: (value, weight) sorted by value with running weight
    val pairs = flatten(zip_with(sketch,
      sequence(lit(0), size(sketch) - 1),
      (vals, lvl) => transform(vals, v =>
        struct(v.as("v"), pow(lit(2.0), lvl).cast("long").as("w")))))
    val sorted = array_sort(pairs, (a, b) =>
      when(a.getField("v") < b.getField("v"), -1)
        .when(a.getField("v") > b.getField("v"), 1).otherwise(0))
    val total = aggregate(sorted, lit(0L), (acc, x) => acc + x.getField("w"))
    val target = greatest(lit(1L), ceil(lit(q) * total).cast("long"))
    // fold: carry (cum, answer); first element reaching target wins
    val folded = aggregate(sorted,
      struct(lit(0L).as("cum"), lit(Double.NaN).as("ans")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("w")
        struct(cum.as("cum"),
          when(acc.getField("ans").isNaN && cum >= target, x.getField("v"))
            .otherwise(acc.getField("ans")).as("ans"))
      })
    folded.getField("ans")
  }
}
