package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap — confidence intervals for corpus-level statistics
  * at any scale (Chamandy et al., "Estimating Uncertainty for Massive
  * Data Streams", 2012; the resample-with-replacement weights of the
  * classic bootstrap converge to independent Poisson(1) weights as n
  * grows, which is what makes the bootstrap shuffle-free: each row draws
  * its weight for every replica LOCALLY, no sampling coordination).
  *
  * Deterministic-by-hash, per the engine's samplers convention: the
  * replica weight of (row, replica) is the Poisson(1) inverse-CDF of a
  * 56-bit md5 uniform — results are a pure function of (data, salt),
  * reproducible across engines/cluster sizes, DuckDB-oracle-checkable.
  *
  * Scale shape: the replica fan-out is an in-row `sequence` explode
  * (work × replicas, the documented cost of the method — production runs
  * pick replicas ≤ ~100 or stratify first); replica means are ONE
  * map-side-combined aggregation of integer-exact (Σ w·v, Σ w) pairs;
  * the rank cut runs over a replicas-bounded frame (constant partition
  * key — the engine's bounded-frame window idiom). */
object Bootstrap {

  /** P(Poisson(1) ≤ k) for k = 0..7 — literal constants shared verbatim
    * with the SQL oracle; weights cap at 8 (P ≈ 1 − 1e-6). */
  val PoissonCdf: Seq[Double] = Seq(
    0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Uniform modulus (2^40 — exact as a double). */
  val UMod: Long = 1L << 40

  /** Poisson(1) inverse CDF of a uniform in [0, 1). */
  def poissonWeight(u: Column): Column =
    PoissonCdf.zipWithIndex.reverse
      .foldLeft(lit(PoissonCdf.length): Column) { case (acc, (c, k)) =>
        when(u < c, lit(k)).otherwise(acc)
      }

  /** Bootstrap CI of the MEAN of integer column `valueCol`: one row
    * (n_docs, n_replicas, mean, ci_lo, ci_hi), `ci_lo`/`ci_hi` the
    * `loRank`-th / `hiRank`-th smallest replica mean (caller picks the
    * ranks for its coverage, e.g. 3/98 of 100 ≈ 95%). Replica means are
    * exact integer ratios until the final division, so the rank order is
    * FP-order stable in every engine. */
  def meanCi(docs: DataFrame, idCol: String, valueCol: String,
             replicas: Int, loRank: Int, hiRank: Int,
             salt: String = "bs|"): DataFrame = {
    require(replicas >= 2 && loRank >= 1 && hiRank <= replicas &&
      loRank <= hiRank, "ranks must lie within the replica count")
    val rep = docs.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("long").as("__v"))
      .withColumn("__b", explode(sequence(lit(0), lit(replicas - 1))))
    val u = (graft.dedup.Dedup.hexHash(
      concat(col("__id"), lit("|"), col("__b")), salt) % UMod)
      .cast("double") / lit(UMod.toDouble)
    val repMeans = rep.withColumn("__w", poissonWeight(u).cast("long"))
      .groupBy(col("__b"))
      .agg(sum(col("__w") * col("__v")).as("__sw"), sum(col("__w")).as("__n"))
      .filter(col("__n") > 0)
      .select(col("__b"), (col("__sw").cast("double") / col("__n")).as("__m"))
    // replicas-bounded frame; constant partition key = no unpartitioned-
    // window warning (the eIvfBalance idiom). The rank picks ride a
    // conditional AGGREGATE (always exactly one row, null on empty
    // input or out-of-range ranks) — a filter+crossJoin would erase the
    // whole result row when a pick matches nothing.
    val ranked = repMeans.withColumn("__rn", row_number().over(
      Window.partitionBy(lit(0)).orderBy(col("__m").asc, col("__b").asc)))
    val picks = ranked.agg(
      max(when(col("__rn") === loRank, col("__m"))).as("__lo"),
      max(when(col("__rn") === hiRank, col("__m"))).as("__hi"))
    docs.agg(count(lit(1)).as("n_docs"),
        avg(col(valueCol).cast("long")).as("__mean"))
      .crossJoin(broadcast(picks))
      .select(col("n_docs"), lit(replicas).cast("long").as("n_replicas"),
        round(col("__mean"), 6).as("mean"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }
}
