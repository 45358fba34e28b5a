package graft.streaming

import graft.SparkSpec
import graft.storage.SnapshotStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Contract of streaming ingest into the snapshot manifest: every
  * committed micro-batch is one atomic readable-as-of version, appends
  * write only the batch's bytes, maintenance interleaves mid-stream, and
  * kill-and-resume from the checkpoint neither loses nor re-commits a
  * batch. */
class StreamingSnapshotIngestSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapingest").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def content(dir: String, v: Long): Set[(Long, String)] =
    SnapshotStore.readAsOf(spark, dir, v)
      .as[(Long, String)].collect().toSet

  test("each micro-batch commits one as-of-readable version; appends carry history") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dir = freshDir()
    val ckpt = java.nio.file.Files.createTempDirectory("snapingest-ckpt").toString
    val (q, handle) = StreamingSnapshotIngest.start(
      input.toDF().toDF("doc_id", "text"), dir, ckpt)

    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    assert(handle.lastCommitted.contains(2L))
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L))
    assert(content(dir, 1L) == Set(1L -> "a", 2L -> "b"),
      "version 1 is batch 0 alone")
    assert(content(dir, 2L) == Set(1L -> "a", 2L -> "b", 3L -> "c"),
      "version 2 reads the accumulated corpus")
    // append semantics: v2's manifest carries v1's files, none rewritten
    val f1 = SnapshotStore.manifest(spark, dir, 1L).files.toSet
    val f2 = SnapshotStore.manifest(spark, dir, 2L).files.toSet
    assert(f1.subsetOf(f2) && (f2 -- f1).nonEmpty,
      "v2 = v1's files + the batch's files")
  }

  test("maintenance compaction interleaves mid-stream; readers keep every version") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dir = freshDir()
    val ckpt = java.nio.file.Files.createTempDirectory("snapingest-ckpt2").toString
    val (q, _) = StreamingSnapshotIngest.start(
      input.toDF().toDF("doc_id", "text"), dir, ckpt)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    // maintenance commit between micro-batches, stream still running
    SnapshotStore.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val ops = SnapshotStore.versions(spark, dir)
      .map(v => SnapshotStore.manifest(spark, dir, v).operation)
    assert(ops == Seq("ingest-b0", "compact", "ingest-b1"), ops)
    assert(content(dir, 3L) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(content(dir, 2L) == Set(1L -> "a", 2L -> "b"),
      "the compacted version holds the same rows")
  }

  test("replay guard: a redelivered batch id is skipped, not re-appended") {
    // the at-least-once window: batch 0 committed its manifest, but the
    // checkpoint offset never landed (simulated with a FRESH checkpoint,
    // which restarts batch ids at 0) — the restarted query must skip it
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir()
    val input1 = MemoryStream[(Long, String)]
    val ckpt1 = java.nio.file.Files.createTempDirectory("snapingest-rg1").toString
    val (q1, _) = StreamingSnapshotIngest.start(
      input1.toDF().toDF("doc_id", "text"), dir, ckpt1)
    input1.addData((1L, "a"))
    q1.processAllAvailable()
    q1.stop()
    assert(SnapshotStore.versions(spark, dir) == Seq(1L))

    val input2 = MemoryStream[(Long, String)]
    val ckpt2 = java.nio.file.Files.createTempDirectory("snapingest-rg2").toString
    val (q2, handle2) = StreamingSnapshotIngest.start(
      input2.toDF().toDF("doc_id", "text"), dir, ckpt2)
    input2.addData((1L, "a")) // batch id 0 again — a redelivery
    q2.processAllAvailable()
    assert(SnapshotStore.versions(spark, dir) == Seq(1L),
      "the replayed batch id must not commit a second version")
    assert(handle2.lastCommitted.isEmpty)
    input2.addData((2L, "b")) // batch id 1 — genuinely new
    q2.processAllAvailable()
    q2.stop()
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L))
    assert(content(dir, 2L) == Set(1L -> "a", 2L -> "b"),
      "later batches append on top of the guarded history")
  }

  test("crash between data write and manifest rename: the replayed batch reclaims and commits") {
    // the torn-commit restart loop ADVICE flagged: the stranded
    // v<N>-ingest-b<K> dir must not wedge the resumed stream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir()
    val input1 = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("snapingest-torn").toString
    val (q1, _) = StreamingSnapshotIngest.start(
      input1.toDF().toDF("doc_id", "text"), dir, ckpt)
    input1.addData((1L, "a"))
    q1.processAllAvailable()
    q1.stop()
    // simulate the crash artifact: version 2's ingest data dir exists,
    // manifest does not (batch 1's commit died mid-protocol)
    Seq((9L, "torn")).toDF("doc_id", "text")
      .write.parquet(s"$dir/data/v00000002-ingest-b1")
    val input2 = MemoryStream[(Long, String)]
    val (q2, _) = StreamingSnapshotIngest.start(
      input2.toDF().toDF("doc_id", "text"), dir, ckpt)
    input2.addData((1L, "a")) // offset 1: already consumed per the checkpoint
    input2.addData((2L, "b")) // offset 2: replays as batch id 1
    q2.processAllAvailable()
    q2.stop()
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L),
      "the resumed stream reclaims the orphan and commits unattended")
    assert(content(dir, 2L) == Set(1L -> "a", 2L -> "b"),
      "the torn data is discarded, the replayed batch's rows land")
  }

  test("downstream incremental consumer: readChangesSince chains ingest without re-scanning history") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir()
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("snapingest-cdc").toString
    val (q, _) = StreamingSnapshotIngest.start(
      input.toDF().toDF("doc_id", "text"), dir, ckpt)
    val consumed = scala.collection.mutable.Set.empty[(Long, String)]
    var lastSeen = 0L
    def drain(): Unit = SnapshotStore.latestVersion(spark, dir).foreach { v =>
      if (v > lastSeen) {
        consumed ++= SnapshotStore.readChangesSince(spark, dir, lastSeen, v)
          .as[(Long, String)].collect()
        lastSeen = v
      }
    }
    input.addData((1L, "a"), (2L, "b")); q.processAllAvailable(); drain()
    assert(consumed == Set(1L -> "a", 2L -> "b"))
    // compaction interleaves — the consumer must NOT re-receive history
    SnapshotStore.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    input.addData((3L, "c")); q.processAllAvailable(); drain()
    q.stop()
    assert(consumed == Set(1L -> "a", 2L -> "b", 3L -> "c"),
      "each row is delivered exactly once across appends and rewrites")
    assert(lastSeen == SnapshotStore.latestVersion(spark, dir).get)
  }

  test("kill and resume: the checkpoint skips committed batches, no version is lost or doubled") {
    import org.apache.spark.sql.DataFrame
    val dir = freshDir()
    val src = java.nio.file.Files.createTempDirectory("snapingest-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("snapingest-ckpt3").toString
    val schema = Seq((1L, "a")).toDF("doc_id", "text").schema

    def addFile(df: DataFrame, name: String): Unit = {
      val staging = java.nio.file.Files.createTempDirectory("stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(part.renameTo(new java.io.File(s"$src/$name.parquet")))
    }
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    addFile(Seq((1L, "a")).toDF("doc_id", "text"), "b1")
    val (q1, _) = StreamingSnapshotIngest.start(stream(), dir, ckpt)
    q1.processAllAvailable()
    q1.stop() // kill after batch 0 committed

    // data lands while the committer is down; resume from the SAME
    // checkpoint — the store needs no seed, its state IS the manifest log
    addFile(Seq((2L, "b")).toDF("doc_id", "text"), "b2")
    val (q2, _) = StreamingSnapshotIngest.start(stream(), dir, ckpt)
    q2.processAllAvailable()
    q2.stop()

    val vs = SnapshotStore.versions(spark, dir)
    assert(vs.length == 2, s"one version per committed batch: $vs")
    assert(content(dir, vs.last) ==
      Set(1L -> "a", 2L -> "b"), "resume loses nothing and doubles nothing")
    assert(content(dir, vs.head) == Set(1L -> "a"))
  }

  test("startUpsert: same-key rows replace across batches; versions stay time-travelable") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dir = freshDir()
    val ckpt = java.nio.file.Files.createTempDirectory("snapupsert-ckpt").toString
    val (q, handle) = StreamingSnapshotIngest.startUpsert(
      input.toDF().toDF("doc_id", "text"), dir, ckpt, Seq("doc_id"))

    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((2L, "B2"), (3L, "c")) // update key 2, insert key 3
    q.processAllAvailable()
    q.stop()

    assert(handle.lastCommitted.contains(2L))
    assert(content(dir, 1L) == Set(1L -> "a", 2L -> "b"))
    assert(content(dir, 2L) == Set(1L -> "a", 2L -> "B2", 3L -> "c"),
      "the cross-batch merge IS the dedup: latest batch wins per key")
    // replay-guard tags ride the same ingest-b<id> discipline
    assert(SnapshotStore.manifest(spark, dir, 2L).operation == "ingest-b1")

    // kill-and-resume: the committed batch is skipped, a new one merges
    val (q2, _) = StreamingSnapshotIngest.startUpsert(
      input.toDF().toDF("doc_id", "text"), dir, ckpt, Seq("doc_id"))
    input.addData((1L, "A9"))
    q2.processAllAvailable()
    q2.stop()
    val vs = SnapshotStore.versions(spark, dir)
    assert(vs == Seq(1L, 2L, 3L), "no version lost or doubled across resume")
    assert(content(dir, 3L) == Set(1L -> "A9", 2L -> "B2", 3L -> "c"))
  }
}
