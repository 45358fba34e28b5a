package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  // in-JVM reference with the engine's exact per-iteration rounding
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = nodes.map(_ -> r6(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map(e => rank(e._1) / deg(e._1)).sum).toMap
      rank = nodes.map(v =>
        v -> r6((1.0 - 0.85) / n + 0.85 * inflow.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  test("equals the in-JVM reference; star center dominates; mass ~ 1") {
    // a 5-spoke star (symmetrized) + a detached 2-cycle
    val pairs = (2L to 6L).map(i => (1L, i)) ++ Seq((10L, 11L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = PageRank(edges, iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(got == ref(pairs ++ pairs.map(_.swap), 3), got)
    assert(got(1L) == got.values.max, "the star center must rank highest")
    assert(math.abs(got.values.sum - 1.0) < 1e-3,
      s"symmetric graph preserves rank mass, got ${got.values.sum}")
  }

  test("parallel edges weight the contribution (multiplicity counts)") {
    // 1 -> 2 twice, 1 -> 3 once: node 2 receives 2/3 of node 1's outflow
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val got = PageRank(edges, iterations = 1)
      .as[(Long, Double)].collect().toMap
    assert(got(2L) > got(3L), got)
  }
}
