package graft.dedup

import graft.SparkSpec

/** The PPJoin guarantee: prefix filtering finds EXACTLY the pairs the
  * all-pairs Jaccard scan finds — zero false negatives (the property
  * MinHash banding trades away) and exact verification kills the false
  * positives. */
class PrefixFilterJoinSpec extends SparkSpec {

  private def bruteForce(sets: Map[Long, Set[Long]], tNum: Long, tDen: Long)
      : Set[(Long, Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size
      uni = (sets(i) | sets(j)).size
      // exact rational compare, like the engine: rounding the display
      // jaccard first would mis-handle boundary pairs at t = 1/3 etc.
      if inter.toLong * tDen >= uni.toLong * tNum
    } yield (i, j, inter.toLong)).toSet
  }

  test("equals the all-pairs scan on seeded overlapping sets") {
    val rnd = new scala.util.Random(17)
    // overlapping families: docs drawn from shared pools so real ≥0.5
    // pairs exist alongside sub-threshold ones
    val sets: Map[Long, Set[Long]] = (1L to 40L).map { id =>
      val pool = (id % 5) * 100
      id -> (0 until (8 + rnd.nextInt(8)))
        .map(_ => pool + rnd.nextInt(20).toLong).toSet
    }.toMap
    val rows = sets.toSeq.flatMap { case (id, s) => s.map(v => (id, v)) }
    val df = spark.createDataFrame(rows).toDF("doc_id", "sh")
    // several rationals, so the all-integer prefix/length/positional
    // bounds are exercised away from the friendly t = 1/2 arithmetic
    for ((tNum, tDen) <- Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))) {
      val got = Dedup.prefixFilterJoin(df, tNum, tDen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
      val want = bruteForce(sets, tNum, tDen)
      assert(got == want,
        s"t=$tNum/$tDen missing=${want -- got} extra=${got -- want}")
    }
    assert(bruteForce(sets, 1L, 2L).nonEmpty,
      "seeded corpus produced no qualifying pairs")
  }

  test("threshold 1 keeps only identical sets") {
    val rows = Seq(
      (1L, 10L), (1L, 11L),
      (2L, 10L), (2L, 11L),       // identical to 1
      (3L, 10L), (3L, 11L), (3L, 12L)) // superset — jaccard 2/3 < 1
    val df = spark.createDataFrame(rows).toDF("doc_id", "sh")
    val got = Dedup.prefixFilterJoin(df, 1L, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
