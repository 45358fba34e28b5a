package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def batchCC(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val p = pairs.toDF("doc_a", "doc_b")
    val ids = p.select(col("doc_a").as("doc_id"))
      .union(p.select(col("doc_b").as("doc_id"))).distinct()
    labelsOf(Dedup.connectedComponents(p, ids, "doc_id"))
  }

  test("streamed increments converge to batch CC over the union of edges") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("scc-ckpt").toString
    val (q, handle) = StreamingConnectedComponents.start(
      input.toDF().toDF("doc_a", "doc_b"), ckpt)

    // batch 1: two separate components {1,2,3} and {10,11}
    input.addData((1L, 2L), (2L, 3L), (10L, 11L))
    q.processAllAvailable()
    assert(labelsOf(handle.currentLabels.get) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

    // batch 2: a bridge merges them, plus a fresh component {20,21}
    input.addData((3L, 10L), (20L, 21L))
    q.processAllAvailable()
    val afterMerge = labelsOf(handle.currentLabels.get)
    q.stop()
    assert(afterMerge ==
      batchCC(Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L), (20L, 21L))))
    assert(afterMerge(11L) == 1L, "merged component must relabel to the min")
  }

  test("replayed edges are a no-op (at-least-once safety)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("scc-ckpt2").toString
    val (q, handle) = StreamingConnectedComponents.start(
      input.toDF().toDF("doc_a", "doc_b"), ckpt)
    input.addData((1L, 2L), (5L, 6L))
    q.processAllAvailable()
    val first = labelsOf(handle.currentLabels.get)
    // identical delivery again — the quotient projection turns every edge
    // into a self-loop, so labels must be unchanged
    input.addData((1L, 2L), (5L, 6L))
    q.processAllAvailable()
    val second = labelsOf(handle.currentLabels.get)
    q.stop()
    assert(first == second, s"replay changed labels: $first vs $second")
  }

  test("seeding from a persisted labeling resumes incremental maintenance") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val seedPairs = Seq((1L, 2L), (3L, 4L))
    val seed = {
      val p = seedPairs.toDF("doc_a", "doc_b")
      val ids = p.select(col("doc_a").as("doc_id"))
        .union(p.select(col("doc_b").as("doc_id"))).distinct()
      Dedup.connectedComponents(p, ids, "doc_id")
    }
    val input = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("scc-ckpt3").toString
    val (q, handle) = StreamingConnectedComponents.start(
      input.toDF().toDF("doc_a", "doc_b"), ckpt, initialLabels = Some(seed))
    input.addData((2L, 3L))
    q.processAllAvailable()
    val got = labelsOf(handle.currentLabels.get)
    q.stop()
    assert(got == batchCC(seedPairs :+ (2L, 3L)))
  }
}
