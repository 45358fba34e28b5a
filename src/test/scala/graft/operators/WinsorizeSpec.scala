package graft.operators

import graft.SparkSpec

/** Winsorize.stats vs a brute-force in-memory reference of the same
  * rank-cut (percentile_disc) convention. */
class WinsorizeSpec extends SparkSpec {

  private def reference(rows: Seq[(String, Long)],
                        pLoNum: Long, pHiNum: Long, pDen: Long)
      : Map[String, (Long, Long, Long, Double, Double)] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.length
      def cut(pNum: Long): Long = {
        // exact ceil(pNum/pDen · n) in integer arithmetic
        val k = ((pNum * n + pDen - 1) / pDen).max(1L)
        vs((k - 1).toInt) // k-th smallest = first value whose cum count >= k
      }
      val (lo, hi) = (cut(pLoNum), cut(pHiNum))
      val w = vs.map(v => math.min(math.max(v, lo), hi))
      g -> ((n.toLong, lo, hi,
        BigDecimal(vs.sum.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(w.sum.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }

  test("matches the brute-force rank-cut reference on a seeded frame") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      val g = s"g${i % 4}"
      // heavy upper tail so clipping visibly moves the mean
      val v = if (rnd.nextInt(20) == 0) 1000L + rnd.nextInt(5000) else rnd.nextInt(100).toLong
      (g, v)
    }
    val df = spark.createDataFrame(rows).toDF("source", "n_chars")
    val got = Winsorize.stats(df, "source", "n_chars", 1, 19, 20).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val want = reference(rows, 1, 19, 20)
    assert(got.keySet == want.keySet)
    got.foreach { case (g, (n, lo, hi, mr, mw)) =>
      val (wn, wlo, whi, wmr, wmw) = want(g)
      assert(n == wn && lo == wlo && hi == whi, s"group $g cuts differ: got ($lo,$hi) want ($wlo,$whi)")
      assert(math.abs(mr - wmr) < 1e-9 && math.abs(mw - wmw) < 1e-9, s"group $g means differ")
      // clipping a heavy upper tail strictly reduces the mean
      assert(mw <= mr, s"group $g winsorized mean above raw")
    }
  }

  test("rank cuts are integer-exact where float ceil is off by one") {
    // 0.07 * 100 = 7.000000000000001 in doubles → ceil 8: the float form
    // cut at the 8th smallest; the exact rational 7/100 must cut at the 7th
    val df = spark.createDataFrame((1 to 100).map(i => ("g", i.toLong)))
      .toDF("source", "n_chars")
    val r = Winsorize.stats(df, "source", "n_chars", 7, 93, 100).collect()
    assert(r.length == 1)
    assert(r(0).getLong(2) == 7L, s"lo cut must be the 7th smallest, got ${r(0).getLong(2)}")
    assert(r(0).getLong(3) == 93L)
  }

  test("degenerate group: constant values clip to themselves") {
    val df = spark.createDataFrame(Seq(("a", 5L), ("a", 5L), ("a", 5L)))
      .toDF("source", "n_chars")
    val r = Winsorize.stats(df, "source", "n_chars", 1, 19, 20).collect()
    assert(r.length == 1)
    assert(r(0).getLong(2) == 5L && r(0).getLong(3) == 5L)
    assert(r(0).getDouble(4) == 5.0 && r(0).getDouble(5) == 5.0)
  }
}
