package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {

  test("withRank equals the naive global window on a tied key") {
    import spark.implicits._
    val rows = (0L until 1000L).map(id => (id, id % 7 + 1))
    val df = rows.toDF("id", "k")
    val got = GlobalRank.withRank(df,
        GlobalRank.scaledBin(col("k"), 7, 4),
        order = Seq(col("k")), tieBreak = Seq(col("id")))
      .select(col("id"), col("__rn"), col("__grank"))
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    val rn = sorted.zipWithIndex.map { case ((id, k), i) => (id, k, i + 1L) }
    val minByK = rn.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    val ref = rn.map { case (id, k, r) => id -> ((r, minByK(k))) }.toMap
    assert(got == ref)
  }

  test("no single-partition window anywhere in the two-pass") {
    import spark.implicits._
    val df = (0L until 500L).map(id => (id, id % 5 + 1)).toDF("id", "k")
    val ranked = GlobalRank.withRank(df,
      GlobalRank.scaledBin(col("k"), 5, 4),
      order = Seq(col("k")), tieBreak = Seq(col("id")))
    ranked.count()
    val globalWindows = ranked.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"the two-pass must never serialize through one window task:\n" +
        ranked.queryExecution.executedPlan)
  }

  test("prefixBin is monotone over binary-sorted strings; ties share a bin") {
    import spark.implicits._
    val words = Seq("", "a", "aa", "ab", "abc", "b", "ba", "zz", "zzz",
      "éclair", "中文")
    val df = words.map(Tuple1(_)).toDF("w")
      .select(col("w"), GlobalRank.prefixBin(col("w")).as("b"))
      .orderBy("w")
    val bins = df.as[(String, Long)].collect()
    assert(bins.map(_._2).toSeq == bins.map(_._2).sorted.toSeq,
      s"bins must be non-decreasing in sort order: ${bins.toSeq}")
    // equal 2-char prefixes share a bin (tie-group containment)
    val byPrefix = bins.groupBy(t => t._1.take(2))
    byPrefix.foreach { case (p, g) =>
      assert(g.map(_._2).distinct.length == 1, s"prefix '$p' split bins: $g")
    }
  }
}
