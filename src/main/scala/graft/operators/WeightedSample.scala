package graft.operators

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement — priority sampling
  * (Duffield/Lund/Thorup, "Priority sampling for estimation of arbitrary
  * subset sums", JACM 2007): each row gets priority `w / u` for a uniform
  * `u ∈ (0, 1]`, the n highest priorities are kept, and every kept row
  * carries the estimator weight `max(w, τ)` (τ = the (n+1)-th priority),
  * which makes sampled subset-sums unbiased estimates of true subset-sums.
  * The standard way to cut a fixed-size, heavy-row-favoring sample (docs
  * weighted by token count, clusters by size) out of a 100 TB corpus for
  * inspection or audit.
  *
  * No RNG: `u` derives from the portable 56-bit content hash of the row id
  * (same [[Dedup.hexHash]] family as the stratified/mixture samplers), so
  * the sample is a pure function of the data — reproducible across runs,
  * engines, and cluster sizes, and DuckDB-reproducible for the oracle.
  *
  * Plan shape: one narrow scan computes priorities; ONE global top-(n+1)
  * cut — TakeOrderedAndProject (bounded per-partition heaps, never a
  * global sort) — serves both the sample (rows ranked ≤ n) and τ (the
  * (n+1)-th priority); the post-cut window runs over ≤ n+1 rows, a
  * driver-bounded artifact. */
object WeightedSample {

  /** Top-`n` priority sample. Returns (doc_id, weight, priority,
    * est_weight): rounded priority (6 dp, id tie-break — the cut order)
    * and the DLT estimator weight `max(w, τ)`, τ = 0 when the corpus has
    * ≤ n rows (then the "sample" is exact and est_weight = weight). */
  def prioritySample(df: DataFrame, idCol: String, weight: Column, n: Int,
                     salt: String = "prio|"): DataFrame = {
    require(n >= 1, "sample size must be >= 1")
    // the single corpus pass: top n+1 by (priority desc, id asc)
    val topNp1 = priorities(df, idCol, weight, salt)
      .orderBy(desc("priority"), asc("doc_id")).limit(n + 1)
    finalizeSample(topNp1, n)
  }

  /** The narrow priority scan: (doc_id, weight, priority). `u` in (0, 1]:
    * 56-bit hash folded to 1..10^6 over 10^6 — coarse enough to stay
    * exactly representable, fine enough that priority ties are broken by
    * the id order anyway. Shared with
    * [[graft.streaming.StreamingWeightedSample]], whose per-batch fold
    * relies on the priorities being a pure function of the rows. */
  private[graft] def priorities(df: DataFrame, idCol: String, weight: Column,
                                salt: String): DataFrame = {
    val id = col(idCol)
    val u = (Dedup.hexHash(id.cast("string"), salt) % 1000000L + 1L)
      .cast("double") / lit(1000000.0)
    df.select(id.cast("long").as("doc_id"),
      weight.cast("double").as("weight"),
      round(weight.cast("double") / u, 6).as("priority"))
  }

  /** τ-finalize a ≤ n+1-row top cut: τ = the (n+1)-th highest priority —
    * min over the cut when it is full, 0 when fewer than n+1 rows exist
    * (the "sample" is then the whole input, exact, est_weight = weight).
    * Both derive from the same cut rows via unbounded windows (the cut
    * output is one partition already, so no extra exchange). */
  private[graft] def finalizeSample(topNp1: DataFrame, n: Int): DataFrame = {
    // ≤ n+1-row frame (the cut output), so a single-partition window is
    // the CORRECT plan. Spark 4.1's EliminateWindowPartitions folds the
    // lit(0) key away and logs its unpartitioned-window warning; that
    // warning is acceptable here precisely because the input is bounded
    // by the TakeOrdered cut upstream (PlanAssertionsSpec fences this)
    val wOrd = Window.partitionBy(lit(0))
      .orderBy(desc("priority"), asc("doc_id"))
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    topNp1
      .select(col("doc_id"), col("weight"), col("priority"),
        row_number().over(wOrd).as("__rn"),
        when(count(lit(1)).over(wAll) === n + 1,
          min(col("priority")).over(wAll)).otherwise(lit(0.0)).as("__tau"))
      .filter(col("__rn") <= n)
      .select(col("doc_id"), col("weight"), col("priority"),
        round(greatest(col("weight"), col("__tau")), 6).as("est_weight"))
  }
}
