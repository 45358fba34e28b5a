package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingMinHashLshSpec extends SparkSpec {

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "completely different text about spark shuffles and partitions here"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5L, "another unrelated document mentioning joins aggregations and windows"),
    (6L, "completely different text about spark shuffles and partitions there"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed batches accumulate exactly the batch-mode candidate pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("lsh-ckpt").toString
    val (q, handle) = StreamingMinHashLsh.start(
      input.toDF().toDF("doc_id", "text"), ckpt)

    input.addData(corpus.take(3): _*)
    q.processAllAvailable()
    input.addData(corpus.drop(3): _*)
    q.processAllAvailable()
    val streamed = pairsOf(handle.candidatePairs.get)
    q.stop()

    val batch = pairsOf(Dedup.minhashCandidates(
      corpus.toDF("doc_id", "text"), "doc_id", "text"))
    assert(streamed == batch,
      s"streamed:\n$streamed\nbatch:\n$batch")
    // sanity: the exact duplicate pair (1, 4) straddles the two batches
    // and must be found by the cross-batch probe at estimate 1.0
    assert(streamed.contains((1L, 4L, 1.0)))
  }

  test("redelivered docs are no-ops: no self-pairs, pairs unchanged") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("lsh-ckpt2").toString
    val (q, handle) = StreamingMinHashLsh.start(
      input.toDF().toDF("doc_id", "text"), ckpt)
    input.addData(corpus.take(4): _*)
    q.processAllAvailable()
    val first = pairsOf(handle.candidatePairs.get)
    input.addData(corpus.take(4): _*) // full redelivery
    q.processAllAvailable()
    val second = pairsOf(handle.candidatePairs.get)
    val indexed = handle.indexedDocs.get.count()
    q.stop()
    assert(first == second, "replay must not add or change pairs")
    assert(!second.exists(p => p._1 == p._2), "no self-pairs ever")
    assert(indexed == 4, "index must not duplicate doc ids")
  }
}
