package graft.streaming

import graft.SparkSpec
import graft.dedup.Winnowing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingWinnowIndexSpec extends SparkSpec {

  // doc 4 copies doc 1 verbatim (cross-batch); doc 6 copies doc 3; doc 5
  // is unrelated — the copied spans are well past the winnowing guarantee
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "completely different text about spark shuffles and partitions here today"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5L, "another unrelated document mentioning joins aggregations and windows"),
    (6L, "completely different text about spark shuffles and partitions here today"))

  private def matchesOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def batchMatches(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    matchesOf(Winnowing.matchesFromFingerprints(
      Winnowing.fingerprints(rows.toDF("doc_id", "text"), "doc_id", "text", 3, 4),
      minShared = 2L))
  }

  test("streamed batches accumulate exactly the batch-mode matches on the union") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("winnow-ckpt").toString
    val (q, handle) = StreamingWinnowIndex.start(
      input.toDF().toDF("doc_id", "text"), ckpt)

    input.addData(corpus.take(3): _*)
    q.processAllAvailable()
    input.addData(corpus.drop(3): _*)
    q.processAllAvailable()
    val streamed = matchesOf(handle.matches.get)
    q.stop()

    val batch = batchMatches(corpus)
    assert(streamed == batch, s"streamed:\n$streamed\nbatch:\n$batch")
    // the verbatim copy pairs straddle the batch boundary: the cross-batch
    // probe must surface both
    assert(streamed.exists(m => m._1 == 1L && m._2 == 4L))
    assert(streamed.exists(m => m._1 == 3L && m._2 == 6L))
  }

  test("redelivered docs are no-ops: no self-matches, matches unchanged") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("winnow-ckpt2").toString
    val (q, handle) = StreamingWinnowIndex.start(
      input.toDF().toDF("doc_id", "text"), ckpt)

    input.addData(corpus: _*)
    q.processAllAvailable()
    val before = matchesOf(handle.matches.get)
    input.addData(corpus.take(4): _*) // at-least-once redelivery
    q.processAllAvailable()
    val after = matchesOf(handle.matches.get)
    q.stop()
    assert(before == after, s"replay changed matches:\n$before\nvs\n$after")
    assert(after.forall(m => m._1 < m._2), "self/non-canonical pair emitted")
  }

  test("kill-and-resume from a persisted index equals the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("winnow-ckpt3").toString

    val input1 = MemoryStream[(Long, String)]
    val (q1, h1) = StreamingWinnowIndex.start(
      input1.toDF().toDF("doc_id", "text"), ckpt)
    input1.addData(corpus.take(3): _*)
    q1.processAllAvailable()
    val persisted = h1.currentIndex.get // "written to storage" at shutdown
    q1.stop()

    // resume: SAME checkpoint (skips committed batches), seeded state
    val input2 = MemoryStream[(Long, String)]
    input2.addData(corpus.take(3): _*) // replayed source data, pre-commit
    val (q2, h2) = StreamingWinnowIndex.start(
      input2.toDF().toDF("doc_id", "text"), ckpt,
      initialIndex = Some(persisted))
    input2.addData(corpus.drop(3): _*)
    q2.processAllAvailable()
    val resumed = matchesOf(h2.matches.get)
    q2.stop()

    assert(resumed == batchMatches(corpus),
      s"resumed run diverged from batch on the union: $resumed")
  }
}
