package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the streaming ROW-GRAIN change feed (round 15): with
  * `readChangeFeed=true` each micro-batch is the Delta-CDF-vocabulary
  * row diff of its version range — streamed == batch
  * [[SnapshotStore.readRowChanges]] at every fold point, the initial
  * snapshot delivers as inserts, and kill-and-resume never redelivers
  * or drops a change. */
class SnapshotCdfSourceSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapcdf").toFile
    d.delete()
    d.getAbsolutePath
  }

  private type Row3 = (Long, String, String) // doc_id, text, _change_type

  test("streamed CDF == batch readRowChanges at every fold point; initial snapshot = inserts") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text"), "ingest")
    val batches = scala.collection.mutable.Buffer.empty[Set[Row3]]
    val ckpt = java.nio.file.Files.createTempDirectory("snapcdf-ckpt").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").option("idCols", "doc_id")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.select("doc_id", "text", "_change_type")
          .as[Row3].collect().toSet; ()
      }.start()
    q.processAllAvailable()
    assert(batches.toList == List(Set(
      (1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert"))),
      s"the starting snapshot delivers wholesale as inserts: $batches")

    // a merge (update 2, insert 4), then a delete (drop 3), then a
    // compaction rewrite (must surface NOTHING row-grain)
    SnapshotStore.merge(spark, dir,
      Seq((2L, "B2"), (4L, "d")).toDF("doc_id", "text"), Seq("doc_id"))
    SnapshotStore.deleteWhere(spark, dir,
      SnapshotStore.FilePredicate.EqTo("doc_id", 3L))
    SnapshotStore.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    q.processAllAvailable()
    q.stop()
    val later = batches.drop(1).reduce(_ ++ _)
    val expected = SnapshotStore
      .readRowChanges(spark, dir, 1L, 4L, Seq("doc_id"))
      .as[Row3].collect().toSet
    assert(later == expected,
      s"streamed fold == batch readRowChanges(1, 4): $later vs $expected")
    assert(later == Set(
      (2L, "b", "update_preimage"), (2L, "B2", "update_postimage"),
      (4L, "d", "insert"), (3L, "c", "delete")),
      "CDF vocabulary: update pre+post pairs, insert, delete; " +
        "unchanged key 1 absent; the compaction surfaced nothing")

    // kill-and-resume: new commits after the stop deliver exactly once
    SnapshotStore.merge(spark, dir,
      Seq((1L, "A9")).toDF("doc_id", "text"), Seq("doc_id"))
    val resumed = scala.collection.mutable.Buffer.empty[Set[Row3]]
    val q2 = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").option("idCols", "doc_id")
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        resumed += b.select("doc_id", "text", "_change_type")
          .as[Row3].collect().toSet; ()
      }.start()
    q2.processAllAvailable()
    q2.stop()
    assert(resumed.reduceOption(_ ++ _).getOrElse(Set.empty) == Set(
      (1L, "a", "update_preimage"), (1L, "A9", "update_postimage")),
      s"resume delivers only the post-checkpoint range: $resumed")
  }

  test("a downstream mirror maintained from the CDF equals the table at the final offset") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 50L).map(i => (i, s"v1-$i")).toDF("doc_id", "text"), "ingest")
    SnapshotStore.merge(spark, dir,
      Seq((10L, "U10"), (51L, "N51")).toDF("doc_id", "text"), Seq("doc_id"))
    SnapshotStore.deleteWhere(spark, dir,
      SnapshotStore.FilePredicate.between("doc_id", 20L, 30L))
    val mirror = scala.collection.mutable.Map.empty[Long, String]
    val ckpt = java.nio.file.Files.createTempDirectory("snapcdf-mirror").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").option("idCols", "doc_id")
      .option("maxVersionsPerTrigger", 1)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id", "text", "_change_type").as[Row3].collect()
          .foreach {
            case (id, t, "insert") => mirror(id) = t
            case (id, t, "update_postimage") => mirror(id) = t
            case (id, _, "delete") => mirror.remove(id)
            case _ => () // preimages carry no state for a mirror
          }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    val table = SnapshotStore.read(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(mirror.toMap == table,
      "applying the CDF stream reconstructs the table exactly")
  }

  test("a deletion-vector delete streams through the CDF exactly like a CoW delete") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 40L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartitionByRange(4, col("doc_id")), "ingest")
    val batches = scala.collection.mutable.Buffer.empty[Set[Row3]]
    val ckpt = java.nio.file.Files.createTempDirectory("snapcdf-dv").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").option("idCols", "doc_id")
        .load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches += b.select("doc_id", "text", "_change_type")
            .as[Row3].collect().toSet; ()
        }.start()
      q.processAllAvailable(); q.stop()
    }
    drain() // initial snapshot
    batches.clear()
    // a vector delete, then a purge rewrite (content-neutral — nothing
    // row-grain may surface for it)
    SnapshotStore.deleteWhereDv(spark, dir,
      SnapshotStore.FilePredicate.between("doc_id", 10L, 12L))
    SnapshotStore.purgeVectors(spark, dir)
    drain()
    val got = batches.filter(_.nonEmpty).foldLeft(Set.empty[Row3])(_ ++ _)
    assert(got == Set(10L, 11L, 12L).map(i => (i, s"t$i", "delete")),
      s"a DV delete must stream as plain deletes and a purge as nothing: $got")
  }

  test("readChangeFeed without idCols refuses loudly") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true")
        .load(dir)
        .writeStream.option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("snapcdf-bad").toString)
        .format("noop").start()
      q.processAllAvailable()
      q.stop()
    }
    assert(e.getMessage != null)
  }
}
