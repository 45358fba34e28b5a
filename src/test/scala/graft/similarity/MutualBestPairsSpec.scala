package graft.similarity

import graft.SparkSpec

/** Similarity.mutualBestPairs vs a brute-force reference of the
  * reciprocal-best criterion. */
class MutualBestPairsSpec extends SparkSpec {

  private def reference(pairs: Seq[(Long, Long, Double)]): Set[(Long, Long)] = {
    val sym = pairs.flatMap(p => Seq((p._1, p._2, p._3), (p._2, p._1, p._3)))
    val best = sym.groupBy(_._1).map { case (id, ps) =>
      id -> ps.minBy(p => (-p._3, p._2))._2 // highest sim, smallest partner
    }
    best.collect {
      case (a, b) if best.get(b).contains(a) && a < b => (a, b)
    }.toSet
  }

  test("matches brute force on a seeded random pair table") {
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 200).map { _ =>
      val a = rnd.nextInt(30).toLong
      val b = rnd.nextInt(30).toLong
      (math.min(a, b), math.max(a, b), math.round(rnd.nextDouble() * 1e6) / 1e6)
    }.filter(p => p._1 != p._2)
      .groupBy(p => (p._1, p._2)).map(_._2.head).toSeq // one score per pair
    val df = spark.createDataFrame(pairs).toDF("id_a", "id_b", "cosine_sim")
    val got = Similarity.mutualBestPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == reference(pairs))
  }

  test("each id appears in at most one mutual pair; hub keeps only one partner") {
    // hub 1 scores highest with 2; 3 and 4 prefer the hub but are not its best
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.8), (1L, 4L, 0.7), (3L, 4L, 0.6))
    val df = spark.createDataFrame(pairs).toDF("id_a", "id_b", "cosine_sim")
    val got = Similarity.mutualBestPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1↔2 mutual; 3's best is 1 (taken) so 3-4 does NOT form (4's best is 1 too)
    assert(got == Set((1L, 2L)))
    val ids = got.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(ids.distinct.length == ids.length)
  }
}
