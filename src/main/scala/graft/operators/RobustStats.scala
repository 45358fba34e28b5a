package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group location/scale + outlier census for an INTEGER
  * metric: median, MAD (median absolute deviation), and the count of
  * rows outside the Hampel cut `|x − med| > 3 · 1.4826 · MAD` — the
  * outlier identifier that, unlike mean/stddev z-scores, cannot be
  * dragged by the outliers it is hunting (breakdown point 50% vs 0%).
  *
  * Scale shape: both medians come from per-group VALUE-COUNT tables
  * (map-side-combined aggregation; running-sum window partitions =
  * distinct values per group — domain-bounded, corpus-independent), the
  * same two-pass histogram discipline as [[Winsorize]]. The Hampel
  * compare is done in scaled integers (`dev · 10⁴ > 44478 · MAD`, since
  * 3 · 1.4826 = 44478/10⁴ exactly), so every reported number is integer-exact and
  * FP-order-independent across engines.
  *
  * Median convention: percentile_disc at 0.5 — the smallest value whose
  * cumulative count reaches ceil(n/2) (lower median; no interpolation,
  * so engines cannot disagree on even-sized groups). */
object RobustStats {

  /** Hampel cut as an exact rational: 3 · 1.4826 = 4.4478 = 44478/10⁴. */
  private val CutNum = 44478L
  private val CutDen = 10000L

  /** Per-group (n_rows, median, mad, n_outliers) of integer column
    * `valueCol`, ordered by group. `scale` divides the integer domain
    * back to display units in the two reported statistics (e.g. cents →
    * 100.0); the outlier census itself never leaves integers. */
  def medianMadOutliers(df: DataFrame, groupCol: String, valueCol: String,
                        scale: Double = 1.0): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"))
    val med = rankMedian(base, "v").withColumnRenamed("cut", "med")
    val dev = base.join(broadcast(med), Seq("g"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = rankMedian(dev.select(col("g"), col("dev").as("v")), "v")
      .withColumnRenamed("cut", "mad")
    dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        round(first(col("med")) / lit(scale), 6).as("median"),
        round(first(col("mad")) / lit(scale), 6).as("mad"),
        sum((col("dev") * CutDen > col("mad") * CutNum).cast("long"))
          .as("n_outliers"))
      .orderBy(groupCol)
  }

  /** Lower median per group g of long column `vCol` via the value-count
    * running sum: smallest value with cum ≥ ceil(n/2). Returns (g, cut). */
  private def rankMedian(df: DataFrame, vCol: String): DataFrame = {
    val vc = df.groupBy(col("g"), col(vCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val tot = vc.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    vc.withColumn("cum",
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("v"))))
      .join(tot, Seq("g"))
      .filter(col("cum") * 2 >= col("n"))
      .groupBy(col("g")).agg(min(col("v")).as("cut"))
  }
}
