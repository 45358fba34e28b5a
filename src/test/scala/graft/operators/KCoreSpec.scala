package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  /** Reference peel to the true fixpoint. */
  private def reference(edges: Set[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val bad = deg.filter(_._2 < k).keySet
      val next = es.filter { case (a, b) => !bad(a) && !bad(b) }
      changed = next != es
      es = next
    }
    es.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
  }

  private def run(edges: Set[(Long, Long)], k: Int,
                  rounds: Int = 12): Map[Long, Long] = {
    import spark.implicits._
    val pairs = edges.toSeq.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
    KCore.coreMembers(pairs, k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain peels away entirely; clique survives with full degree") {
    // path 1-2-3-4 has no 2-core; triangle {5,6,7} is its own 2-core
    val edges = Set((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L))
    val out = run(edges, k = 2)
    assert(out == Map(5L -> 2L, 6L -> 2L, 7L -> 2L))
  }

  test("peeling cascades: removing a leaf re-exposes its support") {
    // triangle {1,2,3} + pendant chain 3-4-5: the chain peels over two
    // rounds (5 first, then 4), triangle survives
    val out = run(Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)), k = 2)
    assert(out.keySet == Set(1L, 2L, 3L))
  }

  test("k above the max degree leaves an empty core") {
    assert(run(Set((1L, 2L), (2L, 3L), (1L, 3L)), k = 5).isEmpty)
  }

  test("pendant chain: bounded exit reports unconverged, enough rounds converge") {
    import spark.implicits._
    // chain 1-2-…-12 peels one node per END per round (≈ n/2 rounds to
    // empty at k=2) — the adversarial shape for a bounded peel
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (bounded, cb) = KCore.coreMembersWithStatus(chain, k = 2, maxRounds = 2)
    assert(!cb, "2 rounds cannot reach the chain's peel fixpoint")
    // the truncated result is a SUPERSET of the (empty) true 2-core
    assert(bounded.count() > 0)
    val (exact, ce) = KCore.coreMembersWithStatus(chain, k = 2, maxRounds = 12)
    assert(ce, "12 rounds reach the fixpoint")
    assert(exact.isEmpty, "a chain has no 2-core")
    // a graph whose peel finishes early converges inside the bound
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    assert(KCore.coreMembersWithStatus(tri, k = 2, maxRounds = 2)._2)
  }

  test("seeded random graphs: bounded peel matches the fixpoint reference") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { trial =>
      val edges = Seq.fill(30)((rnd.nextLong(12), rnd.nextLong(12)))
        .collect { case (a, b) if a != b =>
          (math.min(a, b), math.max(a, b)) }.toSet
      val k = 2 + rnd.nextInt(3)
      if (edges.nonEmpty)
        assert(run(edges, k) == reference(edges, k), s"trial $trial k=$k")
    }
  }
}
