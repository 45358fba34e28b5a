package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupedTopKSpec extends SparkSpec {

  private def scored = {
    import spark.implicits._
    (1 to 200).map(i => (s"g${i % 4}", i.toLong, (i % 37).toDouble))
      .toDF("grp", "id", "score")
  }

  test("matches the window form exactly, including ties") {
    val viaAgg = GroupedTopK.topKPerKey(scored, "grp", "score", "id", k = 7)
      .orderBy("grp", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .select(col("grp"), col("id"), col("score"), col("rank"))
      .orderBy("grp", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("groups smaller than k return all their rows, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("b", 3L, 1.0)).toDF("grp", "id", "score")
    val got = GroupedTopK.topKPerKey(df, "grp", "score", "id", k = 10)
      .orderBy("grp", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 2L, 1L), ("a", 1L, 2L), ("b", 3L, 1L)))
  }

  test("plan: partial/final aggregate pair around ONE exchange — never a full-group sort") {
    val plan = GroupedTopK.topKPerKey(scored, "grp", "score", "id", k = 3)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly one exchange:\n$plan")
    assert(plan.contains("partial_topkagg") ||
      plan.toLowerCase.contains("partial"),
      s"map-side partial aggregation missing — the shuffle would carry every row:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to a window:\n$plan")
  }

  test("TopKAgg buffer invariants: bounded, sorted, merge == reduce order-free") {
    val agg = new GroupedTopK.TopKAgg(3)
    val items = Seq((5.0, 10L), (9.0, 2L), (5.0, 3L), (1.0, 7L), (9.0, 1L), (7.0, 4L))
    val sequential = items.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(sequential == merged, "merge must agree with sequential reduce")
    assert(sequential == Seq((9.0, 1L), (9.0, 2L), (7.0, 4L)),
      s"ties break on id asc: $sequential")
  }
}
