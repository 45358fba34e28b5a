package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ScalableNtile must reproduce Spark's own `ntile(n)` bit-for-bit — the
  * built-in global window is the executable spec (fine at test scale where
  * one task is harmless). Sizes chosen to exercise BOTH formula branches:
  * divisible (N%n == 0) and non-divisible (first N%n tiles one row bigger),
  * plus N < n and single-bin degenerate layouts. */
class ScalableNtileSpec extends SparkSpec {

  private def check(n: Int, numTiles: Int, binStep: Double): Unit = {
    import spark.implicits._
    // deterministic pseudo-random values with duplicates across bins
    val df = (1 to n).map(i => (i.toLong, (i * 37 % 101) * 1.5))
      .toDF("id", "v")
    val expected = df
      .withColumn("t", ntile(numTiles).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "t").as[(Long, Long)].collect().toMap
    val actual = ScalableNtile(df, numTiles,
        bin = floor(col("v") / binStep).cast("long"),
        sortKeys = Seq(col("v"), col("id")), out = "t")
      .select("id", "t").as[(Long, Long)].collect().toMap
    assert(actual == expected,
      s"n=$n tiles=$numTiles step=$binStep: " +
        s"diff=${(actual.toSet -- expected.toSet).take(5)}")
  }

  test("divisible N: matches built-in ntile") {
    check(100, 4, 10.0)
  }

  test("non-divisible N: first N%n tiles take the extra row") {
    check(101, 4, 10.0)
    check(97, 7, 25.0)
    check(14, 3, 40.0)
  }

  test("N < numTiles: one row per leading tile") {
    check(3, 4, 10.0)
  }

  test("degenerate binning: everything in one bin still exact") {
    check(50, 4, 1e9) // single straddling bin — pure window path
  }

  test("null sort values: no row dropped, nulls take the leading tiles") {
    import spark.implicits._
    // nullable sort column -> null bin; must match the built-in's
    // ASC NULLS FIRST ordering, not NPE or silently drop the rows
    val df = ((1 to 8).map(i => (i.toLong, Option(i.toDouble))) ++
      Seq((9L, Option.empty[Double]), (10L, Option.empty[Double]))).toDF("id", "v")
    val expected = df
      .withColumn("t", ntile(4).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "t").as[(Long, Long)].collect().toMap
    val actual = ScalableNtile(df, 4, bin = floor(col("v") / 2.0).cast("long"),
        sortKeys = Seq(col("v"), col("id")), out = "t")
      .select("id", "t").as[(Long, Long)].collect().toMap
    assert(actual == expected, s"got $actual expected $expected")
  }

  test("non-numeric bin expression is rejected at call time") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      ScalableNtile(df, 2, bin = col("s"), sortKeys = Seq(col("s")))
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("fine binning: every row its own bin (pure ladder path)") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val expected = df
      .withColumn("t", ntile(4).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "t").as[(Long, Long)].collect().toMap
    val actual = ScalableNtile(df, 4, bin = col("v").cast("long"),
        sortKeys = Seq(col("v"), col("id")), out = "t")
      .select("id", "t").as[(Long, Long)].collect().toMap
    assert(actual == expected)
  }

  test("ladder path: no join anywhere in the plan (pure scan+project branches)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 101) * 1.5)).toDF("id", "v")
    val plan = ScalableNtile(df, 4, bin = floor(col("v") / 10.0).cast("long"),
        sortKeys = Seq(col("v"), col("id")), out = "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"ladder assignment must not join:\n$plan")
  }

  test("broadcast fallback (numTiles > maxLadderTiles) matches the ladder path") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 101) * 1.5)).toDF("id", "v")
    def run(maxLadder: Long) = ScalableNtile(df, 6,
        bin = floor(col("v") / 10.0).cast("long"),
        sortKeys = Seq(col("v"), col("id")), out = "t", maxLadderTiles = maxLadder)
      .select("id", "t").as[(Long, Long)].collect().toMap
    val viaJoin = run(maxLadder = 1) // forces the broadcast form
    val viaLadder = run(maxLadder = 128)
    assert(viaJoin == viaLadder)
    val expected = df
      .withColumn("t", ntile(6).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "t").as[(Long, Long)].collect().toMap
    assert(viaLadder == expected)
  }
}
