package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {

  import spark.implicits._

  test("poissonWeight follows the Poisson(1) inverse CDF") {
    val got = Seq(0.1, 0.5, 0.9, 0.99, 0.9999, 0.99999999)
      .toDF("u").select(Bootstrap.poissonWeight(col("u")).as("w"))
      .as[Int].collect().toSeq
    // CDF cuts: P≤0=.3679, ≤1=.7358, ≤2=.9197, ≤3=.9810, ≤4=.9963,
    // ≤5=.99941, ≤6=.999917 — so .99→4, .9999→6, 1−1e-8→cap 8
    assert(got == Seq(0, 1, 2, 4, 6, 8))
  }

  test("meanCi brackets the point estimate and is deterministic") {
    val docs = (1L to 200L).map(i => (i, i % 10)).toDF("doc_id", "v")
    def run() = Bootstrap
      .meanCi(docs, "doc_id", "v", replicas = 100, loRank = 3, hiRank = 98)
      .as[(Long, Long, Double, Double, Double)].head()
    val r = run()
    assert(r._1 == 200L && r._2 == 100L)
    assert(r._3 == 4.5)
    assert(r._4 <= r._3 && r._3 <= r._5, s"CI [${r._4}, ${r._5}] vs ${r._3}")
    assert(r._5 - r._4 > 0, "interval must have width")
    assert(run() == r, "hash-deterministic across invocations")
  }

  test("rank bounds are validated") {
    val docs = Seq((1L, 2L)).toDF("doc_id", "v")
    intercept[IllegalArgumentException] {
      Bootstrap.meanCi(docs, "doc_id", "v", 10, 0, 9)
    }
    intercept[IllegalArgumentException] {
      Bootstrap.meanCi(docs, "doc_id", "v", 10, 5, 11)
    }
  }
}
