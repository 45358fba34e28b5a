package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingKMeansSpec extends SparkSpec {

  private val init = Seq(1L -> Array(0.0, 0.0), 2L -> Array(10.0, 10.0))

  test("centroids move to the cluster means across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("skm-ckpt").toString
    val (q, handle) = StreamingKMeans.start(
      input.toDF().toDF("vec_id", "embedding"), ckpt, init)

    // batch 1: two tight blobs around (1,1) and (9,9)
    input.addData((1L, Seq(1f, 1f)), (2L, Seq(1f, 1f)), (3L, Seq(9f, 9f)))
    q.processAllAvailable()
    val m1 = handle.currentModel.centroids.toMap
    assert(m1(1L).toSeq == Seq(1.0, 1.0), s"got ${m1(1L).toSeq}")
    assert(m1(2L).toSeq == Seq(9.0, 9.0))

    // batch 2: running mean pulls cluster 1 toward the new point exactly
    // (2 old at (1,1) + 1 new at (4,4) → mean (2,2)); cluster 2 untouched
    input.addData((4L, Seq(4f, 4f)))
    q.processAllAvailable()
    val m2 = handle.currentModel.centroids.toMap
    q.stop()
    assert(m2(1L).toSeq == Seq(2.0, 2.0), s"got ${m2(1L).toSeq}")
    assert(m2(2L).toSeq == Seq(9.0, 9.0), "memberless centroid must not move")
    assert(handle.currentModel.counts == Map(1L -> 3.0, 2L -> 1.0))
  }

  test("decay < 1 weights recent batches more than the running mean") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("skm-ckpt2").toString
    val (q, handle) = StreamingKMeans.start(
      input.toDF().toDF("vec_id", "embedding"), ckpt,
      Seq(1L -> Array(0.0)), decay = 0.5)
    input.addData((1L, Seq(0f)), (2L, Seq(0f)))
    q.processAllAvailable()
    input.addData((3L, Seq(6f)))
    q.processAllAvailable()
    val c = handle.currentModel.centroids.head._2(0)
    q.stop()
    // running mean would give 2.0; with decay 0.5 the old mass counts as
    // 1 → (0·1 + 6)/(1 + 1) = 3.0
    assert(c == 3.0, s"decayed update should land at 3.0, got $c")
  }

  test("model.assign scores a frame with the maintained centroids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("skm-ckpt3").toString
    val (q, handle) = StreamingKMeans.start(
      input.toDF().toDF("vec_id", "embedding"), ckpt, init)
    input.addData((1L, Seq(1f, 1f)), (2L, Seq(9f, 9f)))
    q.processAllAvailable()
    q.stop()
    val assigned = handle.currentModel.assign(
      Seq((10L, Seq(0f, 0f)), (11L, Seq(8f, 8f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(10L -> 1L, 11L -> 2L))
  }
}
