package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSpanDedupSpec extends SparkSpec {

  // doc 4 copies doc 1 verbatim across the batch boundary; doc 5 embeds
  // doc 2's middle run; doc 6 is fresh (L = 3)
  private val corpus = Seq(
    (1L, "a b c d e f"),
    (2L, "p q r s t u v"),
    (3L, "z z z"),
    (4L, "a b c d e f"),
    (5L, "x y q r s t w"),
    (6L, "fresh words only here"))

  private def cleanedOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap

  private def batchCleaned(rows: Seq[(Long, String)]): Map[Long, (Long, String)] = {
    import spark.implicits._
    cleanedOf(Dedup.exactSpanDedup(
      rows.toDF("doc_id", "text"), "doc_id", "text", spanWords = 3))
  }

  test("streamed cleaning equals batch exactSpanDedup on the union (ordered arrival)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("span-ckpt").toString
    val (q, handle) = StreamingSpanDedup.start(
      input.toDF().toDF("doc_id", "text"), ckpt, spanWords = 3)

    input.addData(corpus.take(3): _*)
    q.processAllAvailable()
    input.addData(corpus.drop(3): _*)
    q.processAllAvailable()
    val streamed = cleanedOf(handle.cleaned.get)
    q.stop()

    val batch = batchCleaned(corpus)
    assert(streamed == batch, s"streamed:\n$streamed\nbatch:\n$batch")
    // cross-batch copy fully removed, partial overlap cut, fresh untouched
    assert(streamed(4L) == ((6L, "")))
    assert(streamed(5L) == ((4L, "x y w")))
    assert(streamed(6L) == ((0L, "fresh words only here")))
  }

  test("redelivery is a no-op; already-emitted docs never change") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("span-ckpt2").toString
    val (q, handle) = StreamingSpanDedup.start(
      input.toDF().toDF("doc_id", "text"), ckpt, spanWords = 3)

    input.addData(corpus.take(4): _*)
    q.processAllAvailable()
    val before = cleanedOf(handle.cleaned.get)
    input.addData(corpus.take(4): _*) // at-least-once redelivery
    q.processAllAvailable()
    val after = cleanedOf(handle.cleaned.get)
    q.stop()
    assert(before == after, s"replay changed the cleaned corpus")
    assert(after.size == 4)
  }

  test("kill-and-resume from persisted state equals the uninterrupted run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("span-ckpt3").toString

    val input1 = MemoryStream[(Long, String)]
    val (q1, h1) = StreamingSpanDedup.start(
      input1.toDF().toDF("doc_id", "text"), ckpt, spanWords = 3)
    input1.addData(corpus.take(3): _*)
    q1.processAllAvailable()
    val persisted = h1.currentState.get
    q1.stop()

    val input2 = MemoryStream[(Long, String)]
    input2.addData(corpus.take(3): _*) // replayed source data, pre-commit
    val (q2, h2) = StreamingSpanDedup.start(
      input2.toDF().toDF("doc_id", "text"), ckpt, spanWords = 3,
      initialState = Some(persisted))
    input2.addData(corpus.drop(3): _*)
    q2.processAllAvailable()
    val resumed = cleanedOf(h2.cleaned.get)
    q2.stop()

    assert(resumed == batchCleaned(corpus),
      s"resumed run diverged from batch on the union: $resumed")
  }
}
