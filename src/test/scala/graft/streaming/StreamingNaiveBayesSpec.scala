package graft.streaming

import graft.SparkSpec
import graft.functions.NaiveBayes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingNaiveBayesSpec extends SparkSpec {

  private val B = 64

  private def batchPreds(labeled: DataFrame, eval: DataFrame)
      : Map[Long, (String, Double)] = {
    import spark.implicits._
    val m = NaiveBayes.train(labeled, "doc_id", "text", "label",
      isTrain = lit(true), buckets = B)
    NaiveBayes.predict(eval, m, "doc_id", "text", "pred_label")
      .as[(Long, String, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  private def handlePreds(h: StreamingNaiveBayes.Handle, eval: DataFrame)
      : Map[Long, (String, Double)] = {
    import spark.implicits._
    h.predict(eval).as[(Long, String, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  private val b1 = Seq(
    (1L, "the quick brown fox jumps", "en"),
    (2L, "der schnelle braune fuchs", "de"))
  // b2 carries a NEVER-SEEN class — the model must grow by one row
  private val b2 = Seq(
    (3L, "the lazy dog naps", "en"),
    (4L, "le renard brun rapide", "fr"))
  private val evalDocs = Seq(
    (10L, "the quick dog"), (11L, "der braune fuchs"), (12L, "le renard"))

  test("streamed model predictions equal batch NB at every fold point (incl. a class first seen mid-stream)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("snb-ck").toString
    val mem = MemoryStream[(Long, String, String)]
    val (q, h) = StreamingNaiveBayes.start(
      mem.toDF().toDF("doc_id", "text", "label"), ckpt, buckets = B)
    try {
      val ev = evalDocs.toDF("doc_id", "text")
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(handlePreds(h, ev) == batchPreds(b1.toDF("doc_id", "text", "label"), ev),
        "after batch 1 the streamed model must reproduce batch NB")
      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(h.currentModel.classes.toSeq == Seq("de", "en", "fr"),
        "mid-stream class must extend the model, sorted")
      assert(handlePreds(h, ev) ==
        batchPreds((b1 ++ b2).toDF("doc_id", "text", "label"), ev),
        "after batch 2 the streamed model must equal the union batch model")
    } finally q.stop()
  }

  test("fold is associative: batch order does not change the model") {
    import spark.implicits._
    val empty = NaiveBayes.Model(Array.empty, Array.empty, Array.empty)
    def fold(m: NaiveBayes.Model, rows: Seq[(Long, String, String)]) =
      StreamingNaiveBayes.foldBatch(m, rows.toDF("doc_id", "text", "label"),
        "doc_id", "text", "label", B, "nb|")
    val ab = fold(fold(empty, b1), b2)
    val ba = fold(fold(empty, b2), b1)
    assert(ab.classes.toSeq == ba.classes.toSeq)
    assert(ab.counts.map(_.toSeq).toSeq == ba.counts.map(_.toSeq).toSeq)
    assert(ab.docs.toSeq == ba.docs.toSeq)
  }

  test("kill and resume: checkpoint skips committed batches; seeded model continues") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("snb-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("snb-rck").toString
    val schema = b1.toDF("doc_id", "text", "label").schema

    def addFile(df: DataFrame, name: String): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(s"$src/$name.parquet")))
    }
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    addFile(b1.toDF("doc_id", "text", "label"), "b1")
    val (q1, h1) = StreamingNaiveBayes.start(stream(), ckpt, buckets = B)
    q1.processAllAvailable()
    val persisted = h1.currentModel
    q1.stop()
    assert(persisted.lastBatch == 0L, "model must carry its fold cursor")

    // data lands while the maintainer is down
    addFile(b2.toDF("doc_id", "text", "label"), "b2")

    val (q2, h2) = StreamingNaiveBayes.start(stream(), ckpt, buckets = B,
      init = Some(persisted))
    q2.processAllAvailable()
    val resumedBatches = q2.recentProgress.map(_.batchId).toSet
    q2.stop()
    assert(resumedBatches.nonEmpty && resumedBatches.min == 1,
      s"resume must start at the post-crash batch, ran $resumedBatches")

    val ev = evalDocs.toDF("doc_id", "text")
    assert(handlePreds(h2, ev) ==
      batchPreds((b1 ++ b2).toDF("doc_id", "text", "label"), ev),
      "resumed model must equal the uninterrupted batch model")
  }

  test("redelivery of a folded-but-uncommitted batch is dropped by the model's own cursor") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // fold batch 0, then restart against a FRESH checkpoint so the source
    // replays batch 0 — the crash-between-fold-and-commit shape
    val mem1 = MemoryStream[(Long, String, String)]
    val ck1 = java.nio.file.Files.createTempDirectory("snb-ck1").toString
    val (q1, h1) = StreamingNaiveBayes.start(
      mem1.toDF().toDF("doc_id", "text", "label"), ck1, buckets = B)
    mem1.addData(b1: _*)
    q1.processAllAvailable()
    val persisted = h1.currentModel
    q1.stop()

    val mem2 = MemoryStream[(Long, String, String)]
    val ck2 = java.nio.file.Files.createTempDirectory("snb-ck2").toString
    val (q2, h2) = StreamingNaiveBayes.start(
      mem2.toDF().toDF("doc_id", "text", "label"), ck2, buckets = B,
      init = Some(persisted))
    mem2.addData(b1: _*) // replayed as batch 0 again
    q2.processAllAvailable()
    q2.stop()
    assert(h2.currentModel.docs.sum == persisted.docs.sum,
      "replayed batch id <= cursor must be a no-op")
  }
}
