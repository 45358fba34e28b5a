package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSketchSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "a a a b b c the the the the"),
      (2L, "b c d e the a"),
      (3L, "f g h the the a a")
    ).toDF("doc_id", "text")
  }

  private def toks = docs
    .select(explode(split(trim(col("text")), " ")).as("token"))
    .filter(col("token") =!= "")

  test("estimates are one-sided: est >= exact count for every token") {
    import spark.implicits._
    // width 8 forces collisions, so the min across rows really decides
    val cms = CountMinSketch.build(toks, "token", depth = 4, width = 8)
    val rows = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .withColumn("est", CountMinSketch.estimate(cms, 4, 8)(col("token")))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, est) =>
      assert(est >= n, s"CMS must never undercount: $t exact=$n est=$est")
    }
  }

  test("every sketch row conserves the total token count") {
    val (depth, width) = (4, 16)
    val cms = CountMinSketch.build(toks, "token", depth, width)
    val total = toks.count()
    (0 until depth).foreach { i =>
      val rowSum = cms.slice(i * width, (i + 1) * width).sum
      assert(rowSum == total, s"row $i sums $rowSum, expected $total")
    }
  }

  test("wide sketch with no cross-row collisions is exact; heavyHitters ranks by it") {
    import spark.implicits._
    val wide = CountMinSketch.heavyHitters(docs, "text", k = 3,
      depth = 4, width = 4096)
    val got = wide.select("token", "est_count", "rank")
      .as[(String, Long, Long)].collect().toSeq
    // exact counts: the=7, a=6, b=3 — a 4096-cell row over 8 distinct
    // tokens collides with probability ~0; rank order is the exact order
    assert(got == Seq(("the", 7L, 1L), ("a", 6L, 2L), ("b", 3L, 3L)), got.toString)
  }

  test("sketches merge associatively: split build equals whole build") {
    val whole = CountMinSketch.build(toks, "token", 4, 32)
    val left = CountMinSketch.build(toks.limit(8), "token", 4, 32)
    // partition-independence is the map-side-combine guarantee; repartition
    // shuffles tokens into different groupings and the sketch must not care
    val reparted = CountMinSketch.build(toks.repartition(7), "token", 4, 32)
    assert(whole.toSeq == reparted.toSeq)
    assert(left.sum <= whole.sum)
  }
}
