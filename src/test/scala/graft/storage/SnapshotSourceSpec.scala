package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the registered `graft-snapshot` source: short-name and
  * class-name resolution, latest-vs-time-travel option, SQL DDL access,
  * and stats pruning reaching scans issued through the source API. */
class SnapshotSourceSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapsrc").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("format(short name) reads latest; option(version) time-travels") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "ingest")
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("doc_id", "text"), "upsert")
    assert(spark.read.format("graft-snapshot").load(dir).count() == 3L)
    assert(spark.read.format("graft.storage.SnapshotSource").load(dir)
      .count() == 3L, "full class name resolves too")
    assert(spark.read.format("graft-snapshot").option("version", 1)
      .load(dir).select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("readStream: manifest versions are offsets; appends deliver once, rewrites never") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "ingest")
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("snapsrc-ckpt").toString
    val q = spark.readStream.format("graft-snapshot").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.as[(Long, String)].collect(); ()
      }.start()
    q.processAllAvailable()
    assert(got == Set(1L -> "a", 2L -> "b"), "history delivered as batch 0")
    SnapshotStore.commitAppend(spark, dir, Seq((3L, "c")).toDF("doc_id", "text"), "append")
    SnapshotStore.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    SnapshotStore.commitAppend(spark, dir, Seq((4L, "d")).toDF("doc_id", "text"), "append")
    q.processAllAvailable()
    q.stop()
    assert(got == Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"),
      "appends delivered exactly once; the compaction rewrite surfaced nothing")

    // kill-and-resume from the same checkpoint: nothing redelivered
    val got2 = scala.collection.mutable.Buffer.empty[(Long, String)]
    SnapshotStore.commitAppend(spark, dir, Seq((5L, "e")).toDF("doc_id", "text"), "append")
    val q2 = spark.readStream.format("graft-snapshot").load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= b.as[(Long, String)].collect(); ()
      }.start()
    q2.processAllAvailable()
    q2.stop()
    assert(got2.toSet == Set(5L -> "e"),
      s"resume must deliver only the new commit, got $got2")
  }

  test("readStream options: startingVersion skips history; maxVersionsPerTrigger bounds batches") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    SnapshotStore.commitAppend(spark, dir, Seq((2L, "b")).toDF("doc_id", "text"), "append")
    SnapshotStore.commitAppend(spark, dir, Seq((3L, "c")).toDF("doc_id", "text"), "append")
    val batches = scala.collection.mutable.Buffer.empty[Set[Long]]
    val ckpt = java.nio.file.Files.createTempDirectory("snapsrc-ckpt2").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("startingVersion", 2).option("maxVersionsPerTrigger", 1)
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.select("doc_id").as[Long].collect().toSet; ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(batches.toList == List(Set(2L), Set(3L)),
      s"one version per trigger, history before v2 skipped: $batches")
  }

  test("readStream option maxBytesPerTrigger: micro-batches bound by " +
    "recorded added bytes, an oversized first version still delivers, " +
    "and everything arrives exactly once") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 100L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest")
    (1 to 4).foreach(r => SnapshotStore.commitAppend(spark, dir,
      (1L to 5L).map(i => (100L + r * 10 + i, s"a$r$i"))
        .toDF("doc_id", "text"), s"append-$r"))
    val batches = scala.collection.mutable.Buffer.empty[Long]
    val got = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.format("graft-snapshot")
      .option("maxBytesPerTrigger", 1) // every byte budget is exceeded:
      // each version must still deliver — alone, one per micro-batch
      .load(dir)
      .writeStream.option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mbpt-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("doc_id").as[Long].collect()
        batches += ids.length.toLong; got ++= ids; ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(batches.count(_ > 0L) == 5,
      s"a 1-byte budget folds exactly one version per batch, got $batches")
    assert(batches.toSeq.filter(_ > 0L).sorted == Seq(5L, 5L, 5L, 5L, 100L))
    assert(got.size == 120, "exactly-once delivery under the byte cap")

    // a budget of exactly two append versions folds version PAIRS:
    // max(b2+b3, b4+b5) admits each pair but never a third version
    val m = SnapshotStore.manifest(spark, dir, 5L)
    def bytesOf(v: Long): Long = m.files
      .filter(_.contains(f"v$v%08d")).map(m.stats(_).bytes).sum
    val budget = math.max(bytesOf(2L) + bytesOf(3L),
      bytesOf(4L) + bytesOf(5L))
    assert(budget > 0L, "recorded sizes drive the meter")
    val batches2 = scala.collection.mutable.Buffer.empty[Long]
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startingVersion", 2)
      .option("maxBytesPerTrigger", budget)
      .load(dir)
      .writeStream.option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mbpt-ckpt2").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches2 += b.count(); ()
      }.start()
    q2.processAllAvailable()
    q2.stop()
    assert(batches2.toSeq.filter(_ > 0L) == Seq(10L, 10L),
      s"a two-version budget folds version pairs, got $batches2")
  }

  test("readStream option startingTimestamp: commits at or after the instant deliver; earlier instants = full history") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    Thread.sleep(5)
    SnapshotStore.commitAppend(spark, dir, Seq((2L, "b")).toDF("doc_id", "text"), "append")
    Thread.sleep(5)
    SnapshotStore.commitAppend(spark, dir, Seq((3L, "c")).toDF("doc_id", "text"), "append")
    val ts2 = SnapshotStore.manifest(spark, dir, 2L).ts
    def collect(opts: Map[String, String]): Set[Long] = {
      val got = scala.collection.mutable.Set.empty[Long]
      val ckpt = java.nio.file.Files.createTempDirectory("snapsrc-ts").toString
      val q = opts.foldLeft(spark.readStream.format("graft-snapshot")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select("doc_id").as[Long].collect(); ()
        }.start()
      q.processAllAvailable(); q.stop()
      got.toSet
    }
    assert(collect(Map("startingTimestamp" -> ts2.toString)) == Set(2L, 3L),
      "the commit AT the instant starts the stream")
    assert(collect(Map("startingTimestamp" -> (ts2 + 1).toString)) == Set(3L),
      "a mid-gap instant starts at the NEXT commit")
    assert(collect(Map("startingTimestamp" -> "1")) == Set(1L, 2L, 3L),
      "an instant before retained history = from the beginning")
    intercept[Exception] {
      collect(Map("startingTimestamp" -> ts2.toString,
        "startingVersion" -> "2"))
    }
  }

  test("write face: mode append/overwrite commit atomic versions; round-trips through read and stream") {
    val dir = freshDir()
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.format("graft-snapshot").option("operation", "seed").save(dir)
    Seq((3L, "c")).toDF("doc_id", "text")
      .write.format("graft-snapshot").mode("append").save(dir)
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L))
    assert(SnapshotStore.manifest(spark, dir, 1L).operation == "seed")
    assert(spark.read.format("graft-snapshot").load(dir)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // overwrite = full snapshot; history keeps reading
    Seq((9L, "z")).toDF("doc_id", "text")
      .write.format("graft-snapshot").mode("overwrite").save(dir)
    assert(spark.read.format("graft-snapshot").load(dir)
      .select("doc_id").as[Long].collect().toSet == Set(9L))
    assert(spark.read.format("graft-snapshot").option("version", 2).load(dir)
      .count() == 3L, "older versions stay readable after overwrite")
    // ErrorIfExists refuses a second seed; Ignore is a no-op
    intercept[RuntimeException] {
      Seq((7L, "x")).toDF("doc_id", "text")
        .write.format("graft-snapshot").save(dir)
    }
    Seq((7L, "x")).toDF("doc_id", "text")
      .write.format("graft-snapshot").mode("ignore").save(dir)
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L, 3L))
    // and the written stats are live: the appended commit file-skips
    import SnapshotStore.FilePredicate._
    assert(SnapshotStore.readAsOfWhere(spark, dir, 2L,
      EqTo("doc_id", 3L)).count() == 1L)
  }

  test("write face: append + partitionBy on an existing table refuses unless it restates the committed layout") {
    val dir = freshDir()
    Seq((1L, "en", "a"), (2L, "de", "b")).toDF("doc_id", "lang", "text")
      .write.format("graft-snapshot").option("partitionBy", "lang").save(dir)
    // silently ignoring the option would let a caller believe they
    // (re)partitioned — refuse loudly instead
    val e = intercept[Exception] {
      Seq((3L, "fr", "c")).toDF("doc_id", "lang", "text")
        .write.format("graft-snapshot").mode("append")
        .option("partitionBy", "doc_id").save(dir)
    }
    assert(e.getMessage.contains("appends inherit the layout"))
    assert(SnapshotStore.versions(spark, dir) == Seq(1L),
      "a refused append must not commit")
    // restating the committed layout exactly is allowed (harmless)
    Seq((3L, "fr", "c")).toDF("doc_id", "lang", "text")
      .write.format("graft-snapshot").mode("append")
      .option("partitionBy", "lang").save(dir)
    assert(spark.read.format("graft-snapshot").load(dir).count() == 3L)
    assert(SnapshotStore.manifest(spark, dir, 2L).partitionCols == Seq("lang"))
    // same discipline for the bloom declaration
    val e2 = intercept[Exception] {
      Seq((4L, "es", "d")).toDF("doc_id", "lang", "text")
        .write.format("graft-snapshot").mode("append")
        .option("bloomCols", "doc_id").save(dir)
    }
    assert(e2.getMessage.contains("appends inherit it"))
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L))
  }

  test("write face: append with mergeKeys is a copy-on-write upsert") {
    val dir = freshDir()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .write.format("graft-snapshot").save(dir)
    Seq((2L, "B2"), (4L, "d")).toDF("doc_id", "text")
      .write.format("graft-snapshot").mode("append")
      .option("mergeKeys", "doc_id").save(dir)
    assert(SnapshotStore.manifest(spark, dir, 2L).operation == "merge")
    assert(spark.read.format("graft-snapshot").load(dir)
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"),
      "same-key rows replaced, new keys appended")
    assert(spark.read.format("graft-snapshot").option("version", 1).load(dir)
      .as[(Long, String)].collect().toMap.apply(2L) == "b",
      "pre-merge version time-travels intact")
  }

  test("write face: mergeKeys honors the operation tag") {
    val dir = freshDir()
    Seq((1L, "a")).toDF("doc_id", "text")
      .write.format("graft-snapshot").save(dir)
    Seq((2L, "b")).toDF("doc_id", "text")
      .write.format("graft-snapshot").mode("append")
      .option("mergeKeys", "doc_id").option("operation", "cdc-apply").save(dir)
    assert(SnapshotStore.manifest(spark, dir, 2L).operation == "cdc-apply")
  }

  test("streaming across a schema-evolution boundary null-fills pre-evolution batches") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    // evolve: v2 adds a score column, so the LATEST manifest's schema
    // (what a fresh stream declares) includes it — but batch 1 delivers
    // v1's pre-evolution files
    SnapshotStore.commitAppend(spark, dir,
      Seq((2L, "b", 0.5)).toDF("doc_id", "text", "score"), "append")
    val got = scala.collection.mutable.Set.empty[(Long, String, Option[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("snapsrc-evo").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("maxVersionsPerTrigger", 1).load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.as[(Long, String, Option[Double])].collect(); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(got == Set((1L, "a", None), (2L, "b", Some(0.5))),
      "the pre-evolution batch must null-fill the evolved column, not crash")
  }

  test("SQL DDL: CREATE TABLE USING graft-snapshot, WHERE prunes files") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 400L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartitionByRange(8, col("doc_id")), "ingest")
    spark.sql("DROP TABLE IF EXISTS snap_ddl")
    spark.sql(s"CREATE TABLE snap_ddl USING `graft-snapshot` " +
      s"OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) FROM snap_ddl WHERE doc_id BETWEEN 90 AND 110")
        .as[Long].head() == 21L)
      // the physical scan read a pruned file subset: with 8 range files
      // of 50 ids each, a 21-id range touches at most 2
      val plan = spark.sql(
        "SELECT * FROM snap_ddl WHERE doc_id BETWEEN 90 AND 110")
      plan.collect()
      val scanStr = plan.queryExecution.executedPlan.toString
      assert(scanStr.contains("FileScan parquet"), scanStr.take(400))
    } finally spark.sql("DROP TABLE IF EXISTS snap_ddl")
  }
}
