package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingFingerprintIndexSpec extends SparkSpec {

  // 8-bit fingerprints, hand-crafted hamming structure:
  //  1 ~ 2 (hamming 1), 2 == 4 (hamming 0, straddles batches),
  //  3 shares a rotated bucket with 1 but sits at hamming 4 (pruned),
  //  5 and 6 are far from everything
  private val fps = Seq(
    (1L, "00000000", 0L),
    (2L, "00000001", 1L),
    (3L, "11110000", 240L),
    (4L, "00000001", 1L),
    (5L, "10101010", 170L),
    (6L, "01010101", 85L))

  private val Bits = 8
  private val Prefix = 4
  private val MaxHamming = 2
  private val Tables = 2

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed batches accumulate exactly the batch-mode pairs; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("fpidx-ckpt").toString
    val (q, handle) = StreamingFingerprintIndex.start(
      input.toDF().toDF("doc_id", "simhash", "sh_long"), ckpt,
      Bits, Prefix, MaxHamming, Tables)

    input.addData(fps.take(3): _*)
    q.processAllAvailable()
    // batch 2 redelivers doc 2 alongside the genuinely new rows
    input.addData(fps.drop(3) :+ fps(1): _*)
    q.processAllAvailable()
    val streamed = pairsOf(handle.candidatePairs.get)
    val indexed = handle.indexedDocs.get.collect().map(_.getLong(0)).toSet
    q.stop()

    val batch = pairsOf(Dedup.simhashPairsMultiTableFromFingerprints(
      fps.toDF("doc_id", "simhash", "sh_long"),
      Bits, Prefix, MaxHamming, Tables))
    assert(streamed == batch, s"streamed:\n$streamed\nbatch:\n$batch")
    // the exact-dup pair (2, 4) straddles the batches: cross-batch probe
    assert(streamed.contains((2L, 4L, 0L)))
    // redelivered doc 2 must not duplicate index rows or create self-pairs
    assert(indexed == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(!streamed.exists(p => p._1 == p._2))
  }

  test("kill and resume from a persisted index equals the uninterrupted run") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val src = java.nio.file.Files.createTempDirectory("fpidx-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fpidx-ckpt2").toString
    val schema = fps.toDF("doc_id", "simhash", "sh_long").schema

    def addFile(df: DataFrame, name: String): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(s"$src/$name.parquet")))
    }
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    addFile(fps.take(3).toDF("doc_id", "simhash", "sh_long"), "b1")
    val (q1, h1) = StreamingFingerprintIndex.start(stream(), ckpt,
      Bits, Prefix, MaxHamming, Tables)
    q1.processAllAvailable()
    val saved = h1.currentIndex.get
    q1.stop()

    // data lands while the maintainer is down; resume with the SAME
    // checkpoint and the persisted index as the seed
    addFile(fps.drop(3).toDF("doc_id", "simhash", "sh_long"), "b2")
    val (q2, h2) = StreamingFingerprintIndex.start(stream(), ckpt,
      Bits, Prefix, MaxHamming, Tables, initialIndex = Some(saved))
    q2.processAllAvailable()
    val resumed = pairsOf(h2.candidatePairs.get)
    q2.stop()

    val batch = pairsOf(Dedup.simhashPairsMultiTableFromFingerprints(
      fps.toDF("doc_id", "simhash", "sh_long"),
      Bits, Prefix, MaxHamming, Tables))
    assert(resumed == batch, s"resumed:\n$resumed\nbatch:\n$batch")
  }
}
