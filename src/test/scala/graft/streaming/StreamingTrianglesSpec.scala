package graft.streaming

import graft.SparkSpec
import graft.operators.Triangles
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingTrianglesSpec extends SparkSpec {

  private def metricsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Double)] =
    df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  private def batchMetrics(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    metricsOf(Triangles.perNode(pairs.toDF("doc_a", "doc_b")))
  }

  test("incremental fold equals batch perNode on the union at every point") {
    import spark.implicits._
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val b2 = Seq((1L, 3L), (3L, 4L)) // closes triangle {1,2,3}
    val b3 = Seq((10L, 12L), (11L, 12L), (2L, 4L)) // triangle {10,11,12} + wedge closure
    var edges = b1.toDF("doc_a", "doc_b").localCheckpoint(true)
    var pn = Triangles.perNode(edges).localCheckpoint(true)
    assert(metricsOf(pn) == batchMetrics(b1))
    val (e2, p2) = Triangles.perNodeIncrement(edges, pn, b2.toDF("doc_a", "doc_b"))
    assert(metricsOf(p2) == batchMetrics(b1 ++ b2))
    val (e3, p3) = Triangles.perNodeIncrement(e2, p2, b3.toDF("doc_a", "doc_b"))
    assert(metricsOf(p3) == batchMetrics(b1 ++ b2 ++ b3))
    assert(e3.count() == (b1 ++ b2 ++ b3).size)
  }

  test("replayed increments are a no-op (at-least-once safety)") {
    import spark.implicits._
    val b1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = b1.toDF("doc_a", "doc_b").localCheckpoint(true)
    val pn = Triangles.perNode(edges).localCheckpoint(true)
    val (e2, p2) = Triangles.perNodeIncrement(edges, pn, b1.toDF("doc_a", "doc_b"))
    assert(metricsOf(p2) == metricsOf(pn))
    assert(e2.count() == 3)
  }

  test("streamed micro-batches converge to the batch metrics of the union") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("stri-ckpt").toString
    val (q, handle) = StreamingTriangles.start(
      input.toDF().toDF("doc_a", "doc_b"), ckpt)
    val b1 = Seq((1L, 2L), (2L, 3L))
    val b2 = Seq((1L, 3L), (3L, 4L), (1L, 4L))
    input.addData(b1: _*)
    q.processAllAvailable()
    assert(metricsOf(handle.currentMetrics.get) == batchMetrics(b1))
    input.addData(b2: _*)
    q.processAllAvailable()
    val streamed = metricsOf(handle.currentMetrics.get)
    q.stop()
    assert(streamed == batchMetrics(b1 ++ b2))
    // node 3 sits in triangles {1,2,3} and {1,3,4}
    assert(streamed(3L)._2 == 2L)
  }
}
