package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Correctness of the synchronous majority-vote label propagation against
  * a brute-force in-memory reference, plus structural invariants. */
class LabelPropagationSpec extends SparkSpec {

  /** In-memory reference: the same deterministic sync/min-tie semantics. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (n, nbrs) =>
        // neighbor labels + the stabilizing self-vote
        val votes = (nbrs.map(lbl) :+ lbl(n)).groupBy(identity).view.mapValues(_.size)
        // most frequent label, smallest label on ties
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val df = spark.createDataFrame(edges).toDF("doc_a", "doc_b")
    LabelPropagation.communities(df, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two triangles with a bridge: communities split at the bridge") {
    // 1-2-3 triangle, 11-12-13 triangle, bridge 3-11
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 3), (11, 12), (11, 13), (12, 13), (3, 11))
    val got = run(edges, rounds = 3)
    assert(got == reference(edges, 3))
    // the triangles keep distinct communities (CC would merge them)
    assert(got(1) == got(2) && got(2) == got(3))
    assert(got(11) == got(12) && got(12) == got(13))
    assert(got(1) != got(11))
  }

  test("matches the brute-force reference on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val edges = (0 until 120).map { _ =>
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    for (rounds <- Seq(1, 2, 4)) {
      assert(run(edges, rounds) == reference(edges, rounds),
        s"mismatch at rounds=$rounds")
    }
  }

  test("labels cover exactly the nodes that appear in edges") {
    val edges = Seq[(Long, Long)]((1, 2), (3, 4), (5, 6))
    val got = run(edges, 2)
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // disconnected 2-cliques: each pair collapses to its min id by round 2
    assert(got(1) == got(2) && got(3) == got(4) && got(5) == got(6))
  }
}
