package graft.operators

import graft.SparkSpec

/** RobustStats.medianMadOutliers vs a brute-force in-memory reference. */
class RobustStatsSpec extends SparkSpec {

  private def reference(rows: Seq[(String, Long)])
      : Map[String, (Long, Long, Long, Long)] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      def lowerMedian(xs: Seq[Long]): Long = {
        val sorted = xs.sorted
        sorted((math.ceil(sorted.length / 2.0).toInt - 1).max(0))
      }
      val med = lowerMedian(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      val out = devs.count(d => d * 10000L > mad * 44478L)
      g -> ((vs.length.toLong, med, mad, out.toLong))
    }

  test("matches brute force on a seeded heavy-tailed frame") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map { i =>
      val g = s"t${i % 3}"
      val v = if (rnd.nextInt(15) == 0) 5000L + rnd.nextInt(20000)
              else 100L + rnd.nextInt(50)
      (g, v)
    }
    val df = spark.createDataFrame(rows).toDF("event_type", "cents")
    val got = RobustStats.medianMadOutliers(df, "event_type", "cents")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), math.round(r.getDouble(2)), math.round(r.getDouble(3)),
          r.getLong(4))))
      .toMap
    val want = reference(rows)
    assert(got.keySet == want.keySet)
    got.foreach { case (g, (n, med, mad, out)) =>
      val (wn, wmed, wmad, wout) = want(g)
      assert(n == wn && med == wmed && mad == wmad,
        s"group $g location/scale differ: got ($med,$mad) want ($wmed,$wmad)")
      assert(out == wout, s"group $g outlier census: got $out want $wout")
      // a 1-in-15 far tail must actually be flagged
      assert(out > 0, s"group $g flagged nothing")
    }
  }

  test("constant group: MAD 0, and every off-value row is an outlier") {
    val rows = Seq.fill(9)(("a", 7L)) :+ ("a", 8L)
    val df = spark.createDataFrame(rows).toDF("g", "v")
    val r = RobustStats.medianMadOutliers(df, "g", "v").collect()(0)
    assert(r.getDouble(2) == 7.0 && r.getDouble(3) == 0.0)
    // dev=1 > 0 * 44478 → the single 8 is an outlier under MAD=0
    assert(r.getLong(4) == 1L)
  }
}
