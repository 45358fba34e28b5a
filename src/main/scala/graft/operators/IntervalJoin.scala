package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join as a binned equi-join — the scale-safe form of
  * `a.start <= b.end AND b.start <= a.end`, which Spark can only plan as
  * a broadcast-nested-loop (every pair compared) because neither side of
  * the conjunction is an equality.
  *
  * Both sides explode to the fixed-width time bins their intervals cover,
  * the join runs equi on the bin id, and the exact overlap predicate
  * filters the candidates. Each overlapping pair is emitted EXACTLY once
  * without a distinct: the pair is kept only in the first bin the two
  * intervals share (`bin == max(floor(aStart/w), floor(bStart/w))`) — the
  * standard grid-join dedup, saving the post-join shuffle.
  *
  * Cost model: work ∝ Σ interval_length/w per side (the explode) plus
  * Σ per-bin occupancy products (the join). Pick `binWidth` near the
  * typical interval length: too small explodes long intervals into many
  * bins; too large piles unrelated intervals into shared bins (the same
  * hot-bucket caveat as every bucketed candidate join — a flash-crowd
  * time window is a skewed key, AQE's skew-join split applies). */
object IntervalJoin {

  /** Overlap-join two interval frames on long-typed [start, end] columns
    * (inclusive ends; a point is start == end). Column names across `a`
    * and `b` must be disjoint, and neither side may already contain the
    * working bin columns `__bin`/`__bin2`; every input column passes
    * through. Start/end names may be arbitrary identifiers (quoted into
    * the bin expressions), but not contain backticks. */
  def overlap(a: DataFrame, aStart: String, aEnd: String,
              b: DataFrame, bStart: String, bEnd: String,
              binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be positive")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "column names of the two sides must be disjoint")
    require(!(a.columns ++ b.columns).exists(Set("__bin", "__bin2")),
      "__bin/__bin2 are reserved working columns of the interval join")
    require(!Seq(aStart, aEnd, bStart, bEnd).exists(_.contains("`")),
      "start/end column names must not contain backticks")
    // `div` = integral division (Column./ is double — lossy past 2^53,
    // i.e. for epoch-nano inputs). Names are backtick-quoted so dotted or
    // keyword-like identifiers parse as plain column references.
    def q(name: String): String = s"`$name`"
    def binned(df: DataFrame, s: String, e: String, binCol: String): DataFrame =
      df.withColumn(binCol,
        explode(expr(s"sequence(${q(s)} div $binWidth, ${q(e)} div $binWidth)")))
    val firstShared =
      expr(s"greatest(${q(aStart)} div $binWidth, ${q(bStart)} div $binWidth)")
    binned(a, aStart, aEnd, "__bin")
      .join(binned(b, bStart, bEnd, "__bin2"),
        col("__bin") === col("__bin2"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bin") === firstShared)
      .drop("__bin", "__bin2")
  }
}
