package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  /** Brute-force reference: count triangles per node from the adjacency
    * set. */
  private def reference(edges: Set[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    adj.map { case (v, ns) =>
      val tri = ns.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      val deg = ns.size.toLong
      val coeff =
        if (deg >= 2) r6(2.0 * tri / (deg * (deg - 1))) else 0.0
      v -> (deg, tri.toLong, coeff)
    }
  }

  private def run(edges: Set[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    val pairs = edges.toSeq.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
    Triangles.perNode(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("triangle + path by hand: counts and coefficients") {
    // triangle {1,2,3} plus a tail 3-4: node 3 has deg 3, 1 triangle,
    // coeff 2·1/(3·2) = 1/3; node 4 deg 1 coeff 0
    val out = run(Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, r6(1.0 / 3))))
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("clique: every node closes all wedges (coefficient 1)") {
    val k = 5L
    val edges = (for {
      a <- 1L to k; b <- (a + 1) to k
    } yield (a, b)).toSet
    val out = run(edges)
    val expectTri = (k - 1) * (k - 2) / 2
    (1L to k).foreach { v =>
      assert(out(v) == ((k - 1, expectTri, 1.0)), s"node $v: ${out(v)}")
    }
  }

  test("seeded random graphs match the brute-force reference") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val edges = Seq.fill(40)((rnd.nextLong(15), rnd.nextLong(15)))
        .collect { case (a, b) if a != b =>
          (math.min(a, b), math.max(a, b)) }.toSet
      if (edges.nonEmpty)
        assert(run(edges) == reference(edges), s"trial $trial: $edges")
    }
  }
}
