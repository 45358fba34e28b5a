package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample tests at corpus scale — the hypothesis-testing
  * siblings of the drift monitors: not "are these distributions
  * different-looking" (JS divergence, `e_dist_drift`) but "is the
  * difference significant at α".
  *
  * Both tests ride the engine's value-count histogram discipline: the
  * data never sorts globally — distributions reduce to (value, count)
  * tables bounded by the metric's DOMAIN, and every statistic is an
  * exact integer ratio until the final division, so results are
  * FP-order stable across engines.
  */
object StatTests {

  /** Kolmogorov-Smirnov critical-value coefficient at α = 0.05. */
  val KsAlpha05: Double = 1.3581015157406195

  /** Exact two-sample KS test of integer column `valueCol` between the
    * `isA` slice and the rest: ONE row (n_a, n_b, ks_d, ks_crit,
    * reject). D = sup |CDF_a − CDF_b| evaluated at every distinct value
    * (exact — the supremum of a step-function difference is attained at
    * a step); the cumulative runs over the value DOMAIN (bounded), on a
    * constant-partition frame. Degenerate input (one slice empty) yields
    * NULL ks_d/reject — "no verdict", not "not rejected"; gate on
    * `reject IS TRUE` downstream. */
  def ksTest(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val c = df.select(isA.as("__a"), col(valueCol).cast("long").as("__v"))
      .groupBy(col("__v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__c1"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__c2"))
    val w = Window.partitionBy(lit(0)).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = c.select(col("__v"), sum(col("__c1")).over(w).as("__k1"),
      sum(col("__c2")).over(w).as("__k2"))
    val tot = c.agg(sum(col("__c1")).as("__n1"), sum(col("__c2")).as("__n2"))
    // nullif guards: an empty slice must yield a NULL verdict, not an
    // ANSI divide-by-zero error
    cum.crossJoin(broadcast(tot))
      .select(abs(col("__k1").cast("double") /
          when(col("__n1") === 0, lit(null)).otherwise(col("__n1")) -
        col("__k2").cast("double") /
          when(col("__n2") === 0, lit(null)).otherwise(col("__n2"))).as("__d"),
        col("__n1"), col("__n2"))
      .groupBy(col("__n1").as("n_a"), col("__n2").as("n_b"))
      .agg(max(col("__d")).as("__dmax"))
      .select(col("n_a"), col("n_b"), round(col("__dmax"), 6).as("ks_d"),
        // n_a·n_b in DOUBLE: a long product overflows at multi-billion-row
        // slices — exactly the scale this test exists for
        round(lit(KsAlpha05) * sqrt((col("n_a") + col("n_b")).cast("double") /
          when(col("n_a") === 0 || col("n_b") === 0, lit(null))
            .otherwise(col("n_a").cast("double") * col("n_b"))), 6)
          .as("ks_crit"),
        (col("__dmax") > lit(KsAlpha05) *
          sqrt((col("n_a") + col("n_b")).cast("double") /
            when(col("n_a") === 0 || col("n_b") === 0, lit(null))
              .otherwise(col("n_a").cast("double") * col("n_b"))))
          .as("reject"))
  }

  /** Pearson chi-square independence statistic of two categorical
    * columns: ONE row (chi2, dof, n). Observed and marginal counts are
    * two (domain-bounded) aggregations; expected = row·col/n; every term
    * is an exact integer ratio. The caller compares `chi2` to their
    * α-quantile for `dof` (no inverse-CDF dependency shipped). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val ra = obs.groupBy(col("__a")).agg(sum(col("__o")).as("__ra"))
    val rb = obs.groupBy(col("__b")).agg(sum(col("__o")).as("__rb"))
    val n = obs.agg(sum(col("__o")).as("__n"))
    // Expected cells with ZERO observed still contribute E (sum over the
    // full a×b grid): cross the marginals, left-join observed. The join
    // is NULL-SAFE (<=>): a null category is a level like any other —
    // a plain using-columns join would orphan its observed counts while
    // the marginals still carried them, inflating the statistic.
    val grid = ra.crossJoin(rb).crossJoin(broadcast(n))
      .join(obs.withColumnRenamed("__a", "__oa").withColumnRenamed("__b", "__ob"),
        col("__a") <=> col("__oa") && col("__b") <=> col("__ob"), "left")
      .select(coalesce(col("__o"), lit(0L)).as("__o"),
        (col("__ra").cast("double") * col("__rb") / col("__n")).as("__e"),
        col("__n"))
    val dims = ra.agg(count(lit(1)).as("__na"))
      .crossJoin(rb.agg(count(lit(1)).as("__nb")))
    grid.groupBy(col("__n"))
      .agg(sum((col("__o") - col("__e")) * (col("__o") - col("__e")) /
        col("__e")).as("__chi2"))
      .crossJoin(broadcast(dims))
      .select(round(col("__chi2"), 6).as("chi2"),
        ((col("__na") - 1) * (col("__nb") - 1)).as("dof"),
        col("__n").as("n"))
  }
}
