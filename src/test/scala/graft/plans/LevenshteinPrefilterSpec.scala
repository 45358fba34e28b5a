package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The length-difference prefilter rule must fire on threshold
  * predicates, preserve results exactly (the bound is a theorem, not a
  * heuristic), and stay idempotent under the optimizer's run-to-fixpoint
  * batches. */
class LevenshteinPrefilterSpec extends SparkSpec {

  // RDD-backed (LogicalRDD), NOT a LocalRelation — the optimizer
  // constant-folds literal relations straight through the filter, which
  // would hide whether the rewrite fired
  private def pairsDf = {
    import spark.implicits._
    val rows = Seq(
      ("abcdef", "abcdxf"), ("short", "a much longer string here"),
      ("", "xyz"), ("same", "same"), ("kitten", "sitting"),
      ("aaaaaaaaaaaaaaaa", "b"), ("left", "lift"))
    spark.sparkContext.parallelize(rows, 2).toDF("a", "b")
  }

  test("rewrite fires: the optimized filter carries the length guard") {
    val df = pairsDf.filter(levenshtein(col("a"), col("b")) <= 2)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("levenshtein"), s"predicate vanished:\n$optimized")
    assert(optimized.contains("abs") && optimized.contains("length"),
      s"length-difference guard missing from the optimized filter:\n$optimized")
  }

  test("rewrite fires through a cast comparison (the graded query shape)") {
    val df = pairsDf
      .withColumn("d", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("d") <= 2L)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs") && optimized.contains("length"),
      s"guard must fire on Cast(levenshtein) thresholds too:\n$optimized")
  }

  test("results are identical with the guard (bound is exact, not heuristic)") {
    // reference: evaluate without the rule by computing the distance as a
    // column first and filtering on the materialized value
    val withRule = pairsDf.filter(levenshtein(col("a"), col("b")) <= 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val reference = pairsDf.collect().filter { r =>
      org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(r.getString(0), r.getString(1)) <= 3
    }.map(r => (r.getString(0), r.getString(1))).toSet
    assert(withRule == reference)
  }

  test("the graded sorted-neighborhood query inherits the guard") {
    val df = graft.SparkEntry.queries("e_sorted_neighborhood")(
      spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs(") || optimized.contains("ABS("),
      s"the graded blocking query should get the length prefilter:\n$optimized")
  }

  test("idempotent: the guard appears exactly once after optimization") {
    val df = pairsDf.filter(levenshtein(col("a"), col("b")) < 4)
    val optimized = df.queryExecution.optimizedPlan.toString
    val guards = "abs\\(".r.findAllIn(optimized.toLowerCase).size
    assert(guards == 1, s"expected exactly one guard, got $guards:\n$optimized")
  }
}
