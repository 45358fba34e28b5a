package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpec {

  // the portable hash, reimplemented independently: first 14 hex chars of
  // md5("prio|" + id) as a long
  private def h56(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"prio|$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }
  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def prio(id: Long, w: Double): Double =
    r6(w / ((h56(id) % 1000000L + 1L).toDouble / 1000000.0))

  private def reference(rows: Seq[(Long, Double)], n: Int)
      : (Seq[(Long, Double, Double)], Double) = {
    val ranked = rows.map { case (id, w) => (id, w, prio(id, w)) }
      .sortBy { case (id, _, p) => (-p, id) }
    val tau = if (ranked.length >= n + 1) ranked(n)._3 else 0.0
    (ranked.take(n), tau)
  }

  test("sample and estimator weights match the independent reference") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, (i % 7 + 1).toDouble))
    val got = WeightedSample.prioritySample(
        rows.toDF("doc_id", "w"), "doc_id", col("w"), n = 10)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val (want, tau) = reference(rows, 10)
    assert(got.length == 10)
    assert(got.map(t => (t._1, t._2, t._3)).sortBy(_._1).toSeq ==
      want.sortBy(_._1), "sample membership/priorities differ from reference")
    got.foreach { case (_, w, _, est) =>
      assert(est == r6(math.max(w, tau)), s"estimator weight must be max(w, τ=$tau)")
    }
  }

  test("corpus smaller than n: exact passthrough, est_weight = weight") {
    import spark.implicits._
    val rows = Seq((1L, 5.0), (2L, 3.0), (3L, 9.0))
    val got = WeightedSample.prioritySample(
        rows.toDF("doc_id", "w"), "doc_id", col("w"), n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(3)))
    assert(got.length == 3)
    got.foreach { case (_, w, est) => assert(est == w, "τ must be 0") }
  }

  test("determinism: two runs produce identical samples") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, (i % 13 + 1).toDouble)).toDF("doc_id", "w")
    val a = WeightedSample.prioritySample(df, "doc_id", col("w"), 20)
      .collect().map(_.toSeq).toSeq
    val b = WeightedSample.prioritySample(df, "doc_id", col("w"), 20)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
