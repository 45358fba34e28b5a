package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {

  import spark.implicits._

  // 4 labeled pairs: matches agree on f1 2/2, on f2 1/2;
  // non-matches agree on f1 0/2, on f2 1/2.
  private val cmp = Seq(
    (1L, 2L, true, true, true),
    (3L, 4L, true, true, false),
    (5L, 6L, false, false, true),
    (7L, 8L, false, false, false))
    .toDF("a", "b", "is_match", "f1", "f2")

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fsWeights: add-one smoothed m/u and log-likelihood weights") {
    val got = RecordLinkage.fsWeights(cmp, "is_match", Seq("f1", "f2"))
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // f1: m=(2+1)/(2+2)=0.75, u=(0+1)/(2+2)=0.25
    val f1 = got("f1")
    assert((f1._2, f1._3) == ((2L, 2L)))
    assert(f1._4 == 0.75 && f1._5 == 0.25)
    assert(f1._6 == r6(math.log(3.0)))        // ln(0.75/0.25)
    assert(f1._7 == r6(math.log(0.25 / 0.75)))
    // f2: m=u=(1+1)/(2+2)=0.5 → both weights 0 (uninformative field)
    val f2 = got("f2")
    assert(f2._4 == 0.5 && f2._5 == 0.5 && f2._6 == 0.0 && f2._7 == 0.0)
  }

  test("scorePairs sums agree/disagree weights per pair") {
    val w = RecordLinkage.fsWeights(cmp, "is_match", Seq("f1", "f2"))
    val got = RecordLinkage
      .scorePairs(cmp, Seq("a", "b"), Seq("f1", "f2"), w)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // f2 weighs 0 everywhere, so scores are f1's weight alone
    assert(got((1L, 2L)) == r6(math.log(3.0)))
    assert(got((5L, 6L)) == r6(math.log(0.25 / 0.75)))
  }

  test("null comparisons are no-evidence: excluded from m/u, score 0 contribution") {
    val withNull = Seq(
      (1L, 2L, true, Some(true)),
      (3L, 4L, true, None),         // missing field on a match pair
      (5L, 6L, false, Some(false)),
      (7L, 8L, false, None))        // and on a non-match pair
      .toDF("a", "b", "is_match", "f1")
    val w = RecordLinkage.fsWeights(withNull, "is_match", Seq("f1"))
      .as[(String, Long, Long, Double, Double, Double, Double)].head()
    // denominators count only the NON-NULL comparisons (1 each)
    assert((w._2, w._3) == ((1L, 1L)))
    assert(w._4 == r6(2.0 / 3) && w._5 == r6(1.0 / 3)) // (1+1)/(1+2), (0+1)/(1+2)
    val ws = RecordLinkage.fsWeights(withNull, "is_match", Seq("f1"))
    val sc = RecordLinkage.scorePairs(withNull, Seq("a", "b"), Seq("f1"), ws)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(sc((3L, 4L)) == 0.0 && sc((7L, 8L)) == 0.0)
  }
}
