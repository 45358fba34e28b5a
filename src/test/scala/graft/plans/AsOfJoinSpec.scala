package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The native as-of join: plans through AsOfJoinExec, and agrees with
  * the carry-forward-window reference formulation on seeded data. */
class AsOfJoinSpec extends SparkSpec {

  private def leftDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3)).toDF("lid", "k", "t")

  private def rightDf(rows: Seq[(Long, Long, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2)).toDF("rid", "rk", "rt")

  /** Window reference: union both sides, carry the last right id/time
    * forward in (time, side, id) order — right rows sort BEFORE left
    * rows at equal time, matching the exec's rt <= t inclusion. */
  private def reference(left: Seq[(Long, Long, Long)],
                        right: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] = {
    left.map { case (lid, k, t) =>
      val cands = right.filter(r => r._2 == k && r._3 <= t)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._3, r._1))._1))
    }.toMap
  }

  test("plans through AsOfJoinExec and matches the reference on seeded data") {
    val rnd = new scala.util.Random(23)
    val left = (1L to 300L).map(i => (i, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val right = (1000L to 1150L).map(i => (i, rnd.nextInt(14).toLong, rnd.nextInt(1000).toLong))
    val df = AsOfJoinExec.asof(leftDf(left), rightDf(right),
      "k", "rk", "t", "rt", rightTieBreak = Some("rid"))
    // AQE wraps the plan, hiding the join from collect() — the string
    // form shows the physical node either way
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "plan does not contain AsOfJoinExec:\n" + df.queryExecution.executedPlan)
    val got = df.select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == reference(left, right))
    assert(got.values.exists(_.isEmpty), "seed produced no null matches")
    assert(got.values.exists(_.nonEmpty), "seed produced no matches at all")
  }

  test("equal-time right rows resolve to the last in tiebreak order") {
    val left = Seq((1L, 5L, 100L))
    val right = Seq((10L, 5L, 100L), (11L, 5L, 100L), (12L, 5L, 101L))
    val df = AsOfJoinExec.asof(leftDf(left), rightDf(right),
      "k", "rk", "t", "rt", rightTieBreak = Some("rid"))
    val r = df.select(col("rid")).collect()
    assert(r.length == 1 && r(0).getLong(0) == 11L,
      s"expected tiebreak winner 11, got ${r.toSeq}")
  }

  test("jx_asof_exec equals the window formulation query on testdata") {
    val d = "/root/testdata/sf0.001"
    val exec = SparkEntry.queries("jx_asof_exec")(spark, d).collect().toSeq
    val win = SparkEntry.queries("jx_asof_join")(spark, d).collect().toSeq
    assert(exec.map(_.toSeq) == win.map(_.toSeq))
  }
}
