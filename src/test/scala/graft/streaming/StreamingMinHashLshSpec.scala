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
    (6L, "completely different text about spark shuffles and partitions here"))

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

  test("full streaming dedup path: docs -> LSH pairs -> incremental CC labels") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("lsh-ckpt3").toString
    val (q, handle) = StreamingMinHashLsh.start(
      input.toDF().toDF("doc_id", "text"), ckpt, minEst = 0.5)

    // batch 1 labels, then fold the batch-2 pair increment in
    input.addData(corpus.take(3): _*)
    q.processAllAvailable()
    val pairs1 = handle.candidatePairs.get.select(col("doc_a"), col("doc_b"))
    val ids1 = pairs1.select(col("doc_a").as("doc_id"))
      .union(pairs1.select(col("doc_b").as("doc_id"))).distinct()
    val labels1 = Dedup.connectedComponents(pairs1, ids1, "doc_id")
    input.addData(corpus.drop(3): _*)
    q.processAllAvailable()
    val pairs2 = handle.candidatePairs.get.select(col("doc_a"), col("doc_b"))
    val increment = pairs2.join(pairs1, Seq("doc_a", "doc_b"), "left_anti")
    val labels = Dedup.connectedComponentsIncremental(labels1, increment)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    // 1, 2, 4 are near/exact dups of each other -> one cluster labeled by
    // the minimum; 3 and 6 share near-identical text -> their own cluster
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(4L) == 1L,
      s"near-dup trio must share the min label, got $labels")
    assert(labels(3L) == 3L && labels(6L) == 3L, s"got $labels")
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
