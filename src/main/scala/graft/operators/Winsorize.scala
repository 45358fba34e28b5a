package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group winsorized statistics for an INTEGER metric — the
  * outlier-robust mean a curator reads next to the raw one (a handful of
  * pathological documents can move a raw per-source length/quality mean
  * arbitrarily; clipping at exact rank-based percentiles bounds their
  * leverage).
  *
  * Scale shape: percentiles are derived from the per-group VALUE-COUNT
  * table, not the corpus — one map-side-combined aggregation to
  * (group, value, count), then a running-sum window whose partition size
  * is the number of DISTINCT values per group (bounded by the metric's
  * domain, e.g. document length — independent of corpus row count), then
  * the per-group (lo, hi) thresholds broadcast back into a codegen clamp
  * over one corpus scan. The same two-pass histogram discipline as
  * `ScalableNtile`/`GroupQuantileCut`, with the histogram kept
  * distributed. All sums are integer-exact, so every reported mean is an
  * FP-order-independent ratio.
  *
  * Threshold convention (both engines, identical by construction):
  * `lo` = smallest value whose cumulative count reaches ceil(pLo·n),
  * `hi` = smallest value whose cumulative count reaches ceil(pHi·n) —
  * i.e. percentile_disc semantics, no interpolation (interpolated
  * percentiles differ across engines in tie handling; rank cuts don't). */
object Winsorize {

  /** Per-group stats of integer column `value` clipped to its
    * [pLoNum/pDen, pHiNum/pDen] rank percentiles: (group, n_rows, lo, hi,
    * mean_raw, mean_winsor), ordered by group. Percentiles are EXACT
    * integer rationals (the RobustStats/SeqQueries convention): the rank
    * cut `cum ≥ ceil(p·n)` is evaluated as `cum·pDen ≥ pNum·n` in pure
    * long arithmetic — a floating `ceil(lit(p) * n)` is off by one
    * whenever p·n lands on a representation error (classic 0.07·100 =
    * 7.000000000000001 → ceil 8). */
  def stats(df: DataFrame, groupCol: String, valueCol: String,
            pLoNum: Long, pHiNum: Long, pDen: Long): DataFrame = {
    require(pDen > 0 && 0 < pLoNum && pLoNum < pHiNum && pHiNum <= pDen,
      "need 0 < pLo < pHi <= 1 as exact rationals over pDen")
    val g = col(groupCol)
    val v = col(valueCol).cast("long")
    val vc = df.groupBy(g.as("g"), v.as("v"))
      .agg(count(lit(1)).as("cnt"))
    val tot = vc.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    // running count over the value-count table: partition rows = distinct
    // values per group (domain-bounded, NOT corpus-bounded)
    val run = vc.withColumn("cum",
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v"))))
      .join(tot, Seq("g"))
    // cum ≥ ceil(pNum/pDen · n)  ⇔  cum·pDen ≥ pNum·n  (all longs, exact)
    def cutAt(pNum: Long): DataFrame = run
      .filter(col("cum") * lit(pDen) >= lit(pNum) * col("n"))
      .groupBy(col("g")).agg(min(col("v")).as(s"cut"))
    val lo = cutAt(pLoNum).withColumnRenamed("cut", "lo")
    val hi = cutAt(pHiNum).withColumnRenamed("cut", "hi")
    val cuts = lo.join(hi, Seq("g"))
    df.select(g.as("g"), v.as("v"))
      .join(broadcast(cuts), Seq("g"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        round(sum(col("v")).cast("double") / count(lit(1)), 6).as("mean_raw"),
        round(sum(least(greatest(col("v"), col("lo")), col("hi"))).cast("double")
          / count(lit(1)), 6).as("mean_winsor"))
      .orderBy(groupCol)
  }

  /** The clamp itself, for callers applying the cut row-wise. */
  def clamp(v: Column, lo: Column, hi: Column): Column =
    least(greatest(v, lo), hi)
}
