package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The cluster-deployment path: a session built WITH
  * `SparkSessionExtensions` (the `spark.sql.extensions=GraftExtensions`
  * equivalent) must get the injected functions, the optimizer rule and
  * the planner strategy WITHOUT any install() call — this is what a user
  * who only sets the config ever sees. */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions injects functions, optimizer rule and as-of strategy") {
    val base = spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base, "expected a fresh session")
      // 1. injected scalar functions resolve in SQL
      val d = s2.sql("SELECT vec_dot(array(CAST(1.0 AS DOUBLE), 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(d == 11.0)
      val sh = s2.sql("SELECT word_shingles(array('a', 'b', 'c'), 2) AS s")
        .head().getSeq[String](0)
      assert(sh == Seq("a b", "b c"))
      // 2. injected optimizer rule: the length-difference guard appears
      import s2.implicits._
      val df = s2.createDataFrame(
        s2.sparkContext.parallelize(Seq(("abc", "abcdefgh"), ("abc", "abd"))))
        .toDF("a", "b")
        .filter(expr("levenshtein(a, b) <= 1"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("length("),
        s"LevenshteinPrefilter guard missing:\n$optimized")
      assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("abc", "abd")))
      // 3. injected planner strategy: as-of joins plan without install()
      val l = s2.createDataFrame(s2.sparkContext.parallelize(
        Seq((1L, 5L, 100L)))).toDF("lid", "k", "t")
      val r = s2.createDataFrame(s2.sparkContext.parallelize(
        Seq((9L, 5L, 90L)))).toDF("rid", "rk", "rt")
      val joined = AsOfJoinExec.asof(l, r, "k", "rk", "t", "rt")
      assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(joined.select(col("rid")).head().getLong(0) == 9L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
