package graft.streaming

import graft.SparkSpec
import graft.functions.ImportanceWeights
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingImportanceWeightsSpec extends SparkSpec {

  private val B = 64

  private def batchScores(docs: DataFrame): Map[Long, (Long, Double)] = {
    import spark.implicits._
    ImportanceWeights.dsirLogRatios(docs, "doc_id", "text",
        isTarget = col("tgt"), buckets = B)
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  private def handleScores(h: StreamingImportanceWeights.Handle,
                           docs: DataFrame): Map[Long, (Long, Double)] = {
    import spark.implicits._
    h.logRatios(docs).as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  private val b1 = Seq(
    (1L, "the quick brown fox", true),
    (2L, "der schnelle fuchs", false))
  private val b2 = Seq(
    (3L, "the lazy brown dog", true),
    (4L, "le renard rapide", false),
    (5L, "the quick dog naps", false))

  test("streamed model scores equal batch DSIR at every fold point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("siw-ck").toString
    val mem = MemoryStream[(Long, String, Boolean)]
    val (q, h) = StreamingImportanceWeights.start(
      mem.toDF().toDF("doc_id", "text", "tgt"), ckpt,
      isTarget = col("tgt"), buckets = B)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      val u1 = b1.toDF("doc_id", "text", "tgt")
      assert(handleScores(h, u1) == batchScores(u1),
        "after batch 1 the streamed model must reproduce batch DSIR")
      mem.addData(b2: _*)
      q.processAllAvailable()
      val u2 = (b1 ++ b2).toDF("doc_id", "text", "tgt")
      assert(handleScores(h, u2) == batchScores(u2),
        "after batch 2 the streamed model must equal the union batch model")
    } finally q.stop()
  }

  test("replaying a batch through the fold is dropped (no double count)") {
    import spark.implicits._
    val df = b1.toDF("doc_id", "text", "tgt")
    val m0 = StreamingImportanceWeights.Model(
      new Array[Long](B), new Array[Long](B))
    val m1 = StreamingImportanceWeights.foldBatch(
      m0, df, "doc_id", "text", col("tgt"), "dsir|")
    // the guard lives in start()'s batch-id check; folding the same batch
    // twice DOES double-count — which is exactly why the guard must exist
    val m2 = StreamingImportanceWeights.foldBatch(
      m1, df, "doc_id", "text", col("tgt"), "dsir|")
    assert(m2.nAll.sum == 2 * m1.nAll.sum,
      "fold is intentionally non-idempotent; start() guards on batch id")
  }

  test("kill and resume: checkpoint skips committed batches; seeded model continues") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("siw-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("siw-rck").toString
    val schema = b1.toDF("doc_id", "text", "tgt").schema

    def addFile(df: DataFrame, name: String): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(s"$src/$name.parquet")))
    }
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    addFile(b1.toDF("doc_id", "text", "tgt"), "b1")
    val (q1, h1) = StreamingImportanceWeights.start(stream(), ckpt,
      isTarget = col("tgt"), buckets = B)
    q1.processAllAvailable()
    val persisted = h1.currentModel
    q1.stop()

    // data lands while the maintainer is down
    addFile(b2.toDF("doc_id", "text", "tgt"), "b2")

    val (q2, h2) = StreamingImportanceWeights.start(stream(), ckpt,
      isTarget = col("tgt"), buckets = B, init = Some(persisted))
    q2.processAllAvailable()
    val resumedBatches = q2.recentProgress.map(_.batchId).toSet
    q2.stop()
    assert(resumedBatches.nonEmpty && resumedBatches.min == 1,
      s"resume must start at the post-crash batch, ran $resumedBatches")

    val u2 = (b1 ++ b2).toDF("doc_id", "text", "tgt")
    assert(handleScores(h2, u2) == batchScores(u2),
      "resumed model must equal the uninterrupted batch model")
  }

  test("redelivery of a folded-but-uncommitted batch is dropped by the model's own cursor") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("siw-src2").toString
    def addFile(df: DataFrame, name: String): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(s"$src/$name.parquet")))
    }
    val schema = b1.toDF("doc_id", "text", "tgt").schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    // fold batch 0 (b1), persist the model, then restart against a FRESH
    // checkpoint — the source replays b1 as batch 0 again, exactly the
    // shape of a crash between the model fold and the checkpoint commit
    addFile(b1.toDF("doc_id", "text", "tgt"), "b1")
    val ck1 = java.nio.file.Files.createTempDirectory("siw-ck1").toString
    val (q1, h1) = StreamingImportanceWeights.start(stream(), ck1,
      isTarget = col("tgt"), buckets = B)
    q1.processAllAvailable()
    val persisted = h1.currentModel
    q1.stop()
    assert(persisted.lastBatch == 0L, "model must carry its fold cursor")

    addFile(b2.toDF("doc_id", "text", "tgt"), "b2")
    val ck2 = java.nio.file.Files.createTempDirectory("siw-ck2").toString
    val (q2, h2) = StreamingImportanceWeights.start(stream(), ck2,
      isTarget = col("tgt"), buckets = B, init = Some(persisted))
    q2.processAllAvailable()
    q2.stop()

    // b1 was re-delivered (batch 0 of the fresh checkpoint) and must NOT
    // fold twice: the final model equals the clean union model
    val u2 = (b1 ++ b2).toDF("doc_id", "text", "tgt")
    assert(handleScores(h2, u2) == batchScores(u2),
      "redelivered batch must not double-count into the model")
  }
}
