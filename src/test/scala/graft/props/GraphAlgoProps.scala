package graft.props

import graft.TestSpark
import graft.operators.LabelPropagation
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Spark-level graph-operator properties (few cases — each is a Spark
  * job): the distributed label propagation must equal the in-memory
  * reference on arbitrary small graphs and round counts. */
object GraphAlgoProps extends Properties("graft.graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private val edgesGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(4, 16)
    m <- Gen.choose(3, 30)
    edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
  } yield edges.map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
    .filter(e => e._1 != e._2).distinct

  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (n, nbrs) =>
        val votes = (nbrs.map(lbl) :+ lbl(n)).groupBy(identity).view.mapValues(_.size)
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  property("LabelPropagation == synchronous reference on random graphs") =
    forAll(edgesGen, Gen.choose(1, 4)) { (edges, rounds) =>
      edges.isEmpty || {
        val df = spark.createDataFrame(edges).toDF("doc_a", "doc_b")
        val got = LabelPropagation.communities(df, rounds).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == reference(edges, rounds)
      }
    }
}
