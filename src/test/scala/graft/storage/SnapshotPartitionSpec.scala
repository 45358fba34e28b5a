package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Contract of partition columns in the snapshot table format (round
  * 15): partitioned commits elide the partition columns from data files
  * (hive `col=value` layout), the manifest records the partition spec,
  * every read restores the values, and a partition predicate prunes the
  * listing BEFORE any stats are consulted. */
class SnapshotPartitionSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snappart").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def docs() = (1L to 300L)
    .map(i => (i, s"t$i", Seq("en", "de", "fr")((i % 3).toInt)))
    .toDF("doc_id", "text", "lang")

  test("partitioned commit: hive layout on disk, partition cols elided from files, reads restore them") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs(), "ingest",
      partitionBy = Seq("lang"))
    val m = SnapshotStore.manifest(spark, dir, 1L)
    assert(m.partitionCols == Seq("lang"))
    assert(m.files.forall(_.contains("lang=")),
      "data files live under hive col=value segments")
    // the files themselves do NOT store the partition column
    val oneFile = spark.read.parquet(m.files.head)
    assert(!oneFile.columns.contains("lang"),
      "partition columns are elided from the data files")
    // the table read restores it
    val got = SnapshotStore.read(spark, dir)
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().toSet
    assert(got == docs().as[(Long, String, String)].collect().toSet)
  }

  test("partition predicate prunes the LISTING with zero stats consulted; answer = full filter") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs(), "ingest",
      partitionBy = Seq("lang"))
    val (df, idx) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, 1L)
    val en = df.filter(col("lang") === "en")
      .select("doc_id").as[Long].collect().toSet
    assert(en == (1L to 300L).filter(_ % 3 == 0).toSet)
    assert(idx.lastPartitionPruned > 0,
      s"the lang predicate must cut the listing: pruned ${idx.lastPartitionPruned}")
    assert(idx.lastStatsPruned == 0,
      "a pure partition predicate consults no stats")
    assert(idx.lastListedCount < idx.inputFiles.length)
    // combined partition + data predicate: both tiers fire
    SnapshotStore.commit(spark, dir,
      docs().repartitionByRange(4, col("doc_id")), "repart",
      partitionBy = Seq("lang"))
    val (df2, idx2) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, 2L)
    val got2 = df2.filter(col("lang") === "de" && col("doc_id") <= 50)
      .select("doc_id").as[Long].collect().toSet
    assert(got2 == (1L to 50L).filter(_ % 3 == 1).toSet)
    assert(idx2.lastPartitionPruned > 0 && idx2.lastStatsPruned > 0,
      s"partition then stats: ${idx2.lastPartitionPruned} / ${idx2.lastStatsPruned}")
  }

  test("appends inherit the layout; CoW delete and merge preserve it; compaction keeps it") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs().filter($"doc_id" <= 200), "ingest",
      partitionBy = Seq("lang"))
    SnapshotStore.commitAppend(spark, dir, docs().filter($"doc_id" > 200), "append")
    assert(SnapshotStore.manifest(spark, dir, 2L).partitionCols == Seq("lang"))
    assert(SnapshotStore.read(spark, dir).count() == 300L)
    // CoW delete keeps partition values on the rewritten rows
    import SnapshotStore.FilePredicate._
    SnapshotStore.deleteWhere(spark, dir, between("doc_id", 1L, 30L))
    val afterDel = SnapshotStore.read(spark, dir)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    assert(afterDel.size == 270 && afterDel(31L) ==
      Seq("en", "de", "fr")((31 % 3).toInt))
    // merge: update one key, insert one key — partitioned write intact
    SnapshotStore.merge(spark, dir,
      Seq((40L, "UPD", "de"), (999L, "NEW", "fr"))
        .toDF("doc_id", "text", "lang"), Seq("doc_id"))
    val afterMerge = SnapshotStore.read(spark, dir)
    assert(afterMerge.filter($"doc_id" === 40L)
      .select("text", "lang").as[(String, String)].head() == (("UPD", "de")))
    assert(afterMerge.filter($"doc_id" === 999L).count() == 1L)
    val m = SnapshotStore.manifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get)
    assert(m.files.forall(_.contains("lang=")),
      "every file of every commit keeps the hive layout")
    // compaction preserves the layout and the content
    val vC = SnapshotStore.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(SnapshotStore.manifest(spark, dir, vC).partitionCols == Seq("lang"))
    assert(SnapshotStore.readAsOf(spark, dir, vC).count() == 271L)
  }

  test("typed partition columns: a numeric partition survives commits and prunes") {
    val dir = freshDir()
    val df = (1L to 100L).map(i => (i, s"t$i", i % 4)).toDF("doc_id", "text", "bucket")
    SnapshotStore.commit(spark, dir, df, "ingest", partitionBy = Seq("bucket"))
    SnapshotStore.commitAppend(spark, dir,
      (101L to 120L).map(i => (i, s"t$i", i % 4)).toDF("doc_id", "text", "bucket"),
      "append")
    val (dfr, idx) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, 2L)
    val got = dfr.filter(col("bucket") === 2).select("doc_id").as[Long].collect().toSet
    assert(got == (1L to 120L).filter(_ % 4 == 2).toSet)
    assert(idx.lastPartitionPruned > 0)
  }

  test("null partition values round-trip through the hive default marker") {
    val dir = freshDir()
    val df = Seq((1L, "a", Option("en")), (2L, "b", Option.empty[String]),
      (3L, "c", Option("de"))).toDF("doc_id", "text", "lang")
    SnapshotStore.commit(spark, dir, df, "ingest", partitionBy = Seq("lang"))
    val got = SnapshotStore.read(spark, dir)
      .select("doc_id", "lang").as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, Some("en")), (2L, None), (3L, Some("de"))))
    // IS NULL / IS NOT NULL partition predicates prune the listing
    val (dfr, idx) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, 1L)
    assert(dfr.filter(col("lang").isNull).select("doc_id").as[Long]
      .collect().toSeq == Seq(2L))
    assert(idx.lastPartitionPruned > 0)
  }

  test("a full-snapshot commit may change the partition layout; the change feed reads across it") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs(), "ingest", partitionBy = Seq("lang"))
    // re-snapshot unpartitioned
    SnapshotStore.commit(spark, dir, docs().filter($"doc_id" <= 100), "replate")
    assert(SnapshotStore.manifest(spark, dir, 2L).partitionCols.isEmpty)
    assert(SnapshotStore.read(spark, dir).count() == 100L)
    // and v1 still reads with its own layout
    assert(SnapshotStore.readAsOf(spark, dir, 1L).count() == 300L)
  }

  test("SQL DML and row-grain CDF compose over a partitioned table") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs(), "ingest",
      partitionBy = Seq("lang"))
    spark.sql("DROP TABLE IF EXISTS part_dml")
    spark.sql(s"CREATE TABLE part_dml USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      // DELETE with a PARTITION-column predicate: the partition column's
      // min=max per-file stats prune the write side too
      spark.sql("DELETE FROM part_dml WHERE lang = 'fr' AND doc_id <= 30")
      val m = SnapshotStore.manifest(spark, dir, 2L)
      assert(m.partitionCols == Seq("lang"), "layout survives SQL DML")
      assert(m.files.forall(_.contains("lang=")))
      spark.sql("UPDATE part_dml SET text = concat(text, '!') WHERE doc_id = 60")
      val got = SnapshotStore.read(spark, dir)
        .select("doc_id", "text", "lang").as[(Long, String, String)]
        .collect().map { case (i, t, l) => i -> ((t, l)) }.toMap
      assert(!got.contains(29L) && got.contains(32L))
      assert(got(60L)._1 == "t60!" && got(60L)._2 == "en")
      // row-grain CDF across the partitioned chain restores partition
      // values on every image row
      val cdf = SnapshotStore.readRowChanges(spark, dir, 1L, 3L, Seq("doc_id"))
        .select("doc_id", "lang", "_change_type")
        .as[(Long, String, String)].collect().toSet
      assert(cdf.contains((29L, "fr", "delete")))
      assert(cdf.contains((60L, "en", "update_preimage")) &&
        cdf.contains((60L, "en", "update_postimage")))
      assert(!cdf.exists(_._1 == 32L), "untouched rows never surface")
    } finally spark.sql("DROP TABLE IF EXISTS part_dml")
  }

  test("escaped partition values (spaces, equals) round-trip") {
    val dir = freshDir()
    val df = Seq((1L, "x", "a b"), (2L, "y", "c=d"), (3L, "z", "plain"))
      .toDF("doc_id", "text", "tag")
    SnapshotStore.commit(spark, dir, df, "ingest", partitionBy = Seq("tag"))
    assert(SnapshotStore.read(spark, dir)
      .select("doc_id", "tag").as[(Long, String)].collect().toSet ==
      Set((1L, "a b"), (2L, "c=d"), (3L, "plain")))
  }
}
