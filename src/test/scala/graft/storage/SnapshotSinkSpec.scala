package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Contract of the registered STREAMING WRITE face
  * (`df.writeStream.format("graft-snapshot")`): one atomic
  * `ingest-b<batchId>` commit per micro-batch, the replay guard against
  * at-least-once redelivery, the `mergeKeys` upsert form, layout-fixing
  * first commits, and the end-to-end CDC mirror composition (stream one
  * snapshot table's changes INTO another through the registered name
  * alone). */
class SnapshotSinkSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapsink").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def ckptDir(): String =
    java.nio.file.Files.createTempDirectory("snapsink-ckpt").toString

  test("each micro-batch commits one ingest-b<id> version; restart from the checkpoint never double-appends") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dir = freshDir()
    val ckpt = ckptDir()
    def start() = input.toDF().toDF("doc_id", "text")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ckpt).start(dir)
    val q = start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L))
    assert(SnapshotStore.manifest(spark, dir, 1L).operation == "ingest-b0")
    assert(SnapshotStore.manifest(spark, dir, 2L).operation == "ingest-b1")
    assert(SnapshotStore.read(spark, dir)
      .as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // restart against the SAME checkpoint: the guard loads the committed
    // max from the manifest log; only genuinely new batches commit
    val q2 = start()
    input.addData((4L, "d"))
    q2.processAllAvailable()
    q2.stop()
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L, 3L),
      "exactly one new version for the one new batch")
    assert(SnapshotStore.read(spark, dir).count() == 4L,
      "no batch may deliver twice across the restart")
  }

  test("mergeKeys turns the sink into a per-batch upsert (the CDC-apply shape)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val dir = freshDir()
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ckptDir())
      .option("mergeKeys", "doc_id").start(dir)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((2L, "B2"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(SnapshotStore.read(spark, dir)
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "B2", 3L -> "c"),
      "same-key rows replace, new keys append")
    assert(SnapshotStore.readAsOf(spark, dir, 1L)
      .as[(Long, String)].collect().toMap.apply(2L) == "b",
      "pre-upsert versions time-travel intact")
  }

  test("a table-creating stream fixes the hive layout and bloom declaration") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val dir = freshDir()
    val q = input.toDF().toDF("doc_id", "lang", "text")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ckptDir())
      .option("partitionBy", "lang")
      .option("bloomCols", "doc_id").start(dir)
    input.addData((1L, "en", "a"), (2L, "de", "b"))
    q.processAllAvailable()
    input.addData((3L, "en", "c"))
    q.processAllAvailable()
    q.stop()
    val m = SnapshotStore.manifest(spark, dir, 2L)
    assert(m.partitionCols == Seq("lang") && m.bloomCols == Seq("doc_id"),
      "the first commit fixes the layout; appends inherit it")
    assert(m.files.forall(_.contains("lang=")),
      "every data file lands under its hive partition dir")
    assert(SnapshotStore.read(spark, dir)
      .filter(col("lang") === "en").count() == 2L)
  }

  test("a CDC mirror: readChangeFeed of one table streams INTO another through the registered name alone") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = freshDir(); val mirror = freshDir()
    SnapshotStore.commit(spark, src,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text"), "ingest")
    def sync(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").option("idCols", "doc_id")
        .load(src)
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type")
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation", s"$mirror-ckpt")
        .option("mergeKeys", "doc_id").start(mirror)
      q.processAllAvailable(); q.stop()
    }
    sync()
    assert(SnapshotStore.read(spark, mirror)
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // source mutates (upsert); the mirror follows incrementally
    SnapshotStore.merge(spark, src,
      Seq((2L, "B2"), (4L, "d")).toDF("doc_id", "text"), Seq("doc_id"))
    sync()
    assert(SnapshotStore.read(spark, mirror)
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"),
      "the mirror applies updates and inserts from the row-grain feed")
  }

  test("non-append output modes refuse as AnalysisException (Complete AND " +
    "Update), with the mergeKeys-mirror guidance in the message") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      input.toDF().toDF("doc_id", "text")
        .groupBy("text").count()
        .writeStream.format("graft-snapshot")
        .outputMode("complete")
        .option("checkpointLocation", ckptDir()).start(freshDir())
    }
    assert(e.getMessage.contains("Append output mode only"))
    assert(e.getMessage.contains("mergeKeys"),
      "the refusal should point at the supported Update-shaped route")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      input.toDF().toDF("doc_id", "text")
        .groupBy("text").count()
        .writeStream.format("graft-snapshot")
        .outputMode("update")
        .option("checkpointLocation", ckptDir()).start(freshDir())
    }
    assert(e2.getMessage.contains("Append output mode only"))
  }

  test("a table-creating mergeKeys (CDC-mirror) first batch fixes the " +
    "declared hive layout and bloom columns — not a frozen bare layout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val dir = freshDir()
    val q = input.toDF().toDF("doc_id", "grp", "text")
      .writeStream.format("graft-snapshot")
      .option("mergeKeys", "doc_id")
      .option("partitionBy", "grp")
      .option("bloomCols", "doc_id")
      .option("checkpointLocation", ckptDir()).start(dir)
    input.addData((1L, "a", "x"), (2L, "b", "y"))
    q.processAllAvailable()
    // a second batch exercises the upsert path over the fixed layout
    input.addData((2L, "b", "y2"), (3L, "a", "z"))
    q.processAllAvailable()
    q.stop()
    val m = SnapshotStore.manifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get)
    assert(m.partitionCols == Seq("grp"),
      "the first (table-creating) upsert batch must fix partitionBy")
    assert(m.bloomCols == Seq("doc_id"),
      "…and the bloom declaration")
    assert(SnapshotStore.read(spark, dir)
      .select("doc_id", "grp", "text")
      .as[(Long, String, String)].collect().toSet ==
      Set((1L, "a", "x"), (2L, "b", "y2"), (3L, "a", "z")))
  }
}
