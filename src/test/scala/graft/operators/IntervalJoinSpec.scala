package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  test("binned overlap equals the naive inequality join, each pair once") {
    import spark.implicits._
    val a = Seq((1L, 0L, 10L), (2L, 5L, 25L), (3L, 100L, 100L))
      .toDF("aid", "as", "ae")
    val b = Seq((10L, 8L, 12L), (11L, 30L, 40L), (12L, 95L, 105L),
      (13L, 0L, 200L)).toDF("bid", "bs", "be")
    for (w <- Seq(1L, 3L, 7L, 50L, 1000L)) {
      val got = IntervalJoin.overlap(a, "as", "ae", b, "bs", "be", w)
        .select(col("aid"), col("bid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val naive = a.join(b, col("as") <= col("be") && col("bs") <= col("ae"))
        .select(col("aid"), col("bid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted == naive.sorted, s"binWidth=$w: $got vs $naive")
      assert(got.length == got.distinct.length,
        s"binWidth=$w: a pair was emitted more than once")
    }
  }

  test("epoch-nano inputs stay exact (no double truncation)") {
    import spark.implicits._
    // adjacent nanos around 2^60 — double arithmetic would collapse them
    val base = 1L << 60
    val a = Seq((1L, base, base)).toDF("aid", "as", "ae")
    val b = Seq((10L, base, base), (11L, base + 1, base + 1))
      .toDF("bid", "bs", "be")
    val got = IntervalJoin.overlap(a, "as", "ae", b, "bs", "be", 1000L)
      .select(col("bid")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L), s"only the exact-nano match may join, got $got")
  }

  test("disjoint column names are enforced") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("s", "e")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlap(a, "s", "e", a, "s", "e", 10L)
    }
  }
}
