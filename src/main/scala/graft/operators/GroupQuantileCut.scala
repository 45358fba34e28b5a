package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile cut: keep the top `frac` fraction of each group's
  * rows by `score` — the per-language quality threshold of a curation
  * pipeline. One GLOBAL threshold lets high-resource languages eat the
  * whole budget (their score distribution dominates); one WINDOW per group
  * serializes the dominant language through a single task at 100 TB. This
  * is the third option: exact per-group quantile semantics at histogram
  * cost.
  *
  * Histogram two-pass (the [[TokenBudgetSample]] / [[ScalableNtile]]
  * family, cutting on row COUNT ranked by the score itself):
  *
  *  1. rows bin by `floor(score · nBins)` (the score must live in [0, 1];
  *     1.0 clamps into the top bin, null folds to 0.0); per-(group, bin)
  *     counts aggregate map-side-combined to the driver — bounded:
  *     groups × nBins rows.
  *  2. per group, k = floor(frac · total) rows survive. Walking bins
  *     DESCENDING: bins that fit the quota whole are kept by a codegen'd
  *     filter against the broadcast (group → cut) table — no window, no
  *     extra shuffle; bins past the quota drop whole; the ONE straddling
  *     bin per group window-ranks its rows (≤ 1/nBins of the group in
  *     expectation — `nBins` is the knob) by (score desc, id asc) for the
  *     remaining quota.
  *
  * Exactness: binning is monotone in the score, so whole-bin keeps agree
  * with the global (score desc, id asc) ranking, and equal scores always
  * share a bin, where the id tie-break decides — the result is EXACTLY
  * "row_number over (partition by group order by score desc, id) ≤
  * floor(frac·n)". For cross-engine reproducibility feed a score already
  * rounded (the 6-decimal convention every oracle uses).
  */
object GroupQuantileCut {

  /** Hard ceiling on driver-histogram cells (groups × nBins). The group
    * cardinality is MEASURED (one cheap count-distinct) before any
    * group-sized collect — the bound is checked, never assumed (the
    * `BpeVocab.train` measured-size idiom). Above the ceiling the exact
    * per-group window runs instead: a high-cardinality group column
    * means each group is small, so the per-group window parallelizes
    * across groups — the single-task serialization the histogram path
    * exists to avoid only happens with FEW, HUGE groups, which is
    * exactly when the measured cardinality stays under the ceiling. */
  val MaxDriverHistogramCells: Long = 1L << 22

  def apply(df: DataFrame, idCol: String, groupCol: String, score: Column,
            frac: Double, nBins: Int = 1024,
            maxDriverCells: Long = MaxDriverHistogramCells): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    require(nBins >= 1, "nBins must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    // group by a STRING rendering so the histogram collect and the cut
    // join work for any group column type (int domains, dates, ...); a
    // null group renders as a sentinel no real value collides with
    val base = df
      .withColumn("__grp",
        coalesce(col(groupCol).cast("string"), lit("\u0000null")))
      .withColumn("__score", coalesce(score.cast("double"), lit(0.0)))
      .withColumn("__bin",
        least(floor(col("__score") * nBins), lit(nBins - 1L)).cast("long"))
    // CHECKED bound: measure the group cardinality before collecting
    // anything group-sized to the driver
    val nGroups = base.select(countDistinct(col("__grp"))).as[Long].head()
    if (nGroups * nBins > maxDriverCells) return windowed(base, idCol, frac, cols)
    // bounded driver histogram: groups × nBins, measured above
    val hist = base.groupBy(col("__grp"), col("__bin"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    // per group: rows in bins ABOVE `straddle` keep whole; rows IN it rank
    // for `quota`; everything below drops. k = 0 → nothing survives.
    val cuts = hist.keys.toSeq.sorted.map { g =>
      val bins = hist(g).map(t => (t._2, t._3)).sortBy(-_._1)
      val total = bins.map(_._2).sum
      val k = (frac * total).toLong
      var acc = 0L
      var straddle = Long.MaxValue
      var quota = 0L
      var i = 0
      while (i < bins.length && straddle == Long.MaxValue) {
        val (bin, cnt) = bins(i)
        if (acc + cnt <= k) acc += cnt
        else { straddle = bin; quota = k - acc }
        i += 1
      }
      // the loop only finishes without a straddle when every bin fit the
      // quota (k == total, i.e. frac == 1): keep every bin whole via a
      // below-everything sentinel
      if (straddle == Long.MaxValue) straddle = Long.MinValue
      (g, straddle, quota)
    }
    val cutTable = broadcast(cuts.toDF("__grp", "__straddle", "__quota"))
    val marked = base.join(cutTable, Seq("__grp"))
    val whole = marked.filter(col("__bin") > col("__straddle"))
    val straddleRows = marked.filter(col("__bin") === col("__straddle"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__grp"))
          .orderBy(col("__score").desc, col(idCol))))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn")
    whole.unionByName(straddleRows)
      .select(cols.map(col): _*)
  }

  /** The exact windowed definition — the high-cardinality fallback:
    * `row_number over (partition by group order by score desc, id) <=
    * floor(frac · count(group))`. SAME semantics as the histogram path
    * (binning is monotone in the score, ties share a bin — spec-proven
    * equal); distributed because many groups ⇒ small groups ⇒ the
    * per-group partitions spread across the cluster. */
  private def windowed(base: DataFrame, idCol: String, frac: Double,
                       cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("__grp"))
    base
      .withColumn("__rn", row_number().over(
        w.orderBy(col("__score").desc, col(idCol))))
      .withColumn("__k",
        floor(lit(frac) * count(lit(1)).over(w)).cast("long"))
      .filter(col("__rn") <= col("__k"))
      .select(cols.map(col): _*)
  }
}
