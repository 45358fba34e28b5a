package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the round-18 SQL maintenance verbs: `RESTORE TABLE ...
  * TO VERSION|TIMESTAMP AS OF`, `CREATE TABLE ... SHALLOW|DEEP CLONE`,
  * and `DESCRIBE DETAIL` — the Delta verbs a pure-SQL user reaches for
  * weekly, over the existing store primitives. */
class SnapshotSqlVerbsSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapverbs").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("RESTORE TABLE TO VERSION AS OF rolls back as a new commit, " +
    "rolls the catalog schema back across a DDL, and TIMESTAMP AS OF " +
    "resolves through the monotone commit clock") {
    val dir = freshDir()
    val tbl = "graft_restore_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    SnapshotStore.commit(spark, dir,
      (1L to 30L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      val ts1 = SnapshotStore.manifest(spark, dir, 1L).ts
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (score BIGINT)") // v2
      spark.sql(s"INSERT INTO $tbl VALUES (100, 'new', 7)")     // v3
      assert(spark.table(tbl).count() == 31L)
      val out = spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 1").collect()
      assert(out.length == 1 && out(0).getLong(0) == 1L &&
        out(0).getLong(1) == 4L)
      assert(spark.table(tbl).count() == 30L)
      assert(spark.table(tbl).columns.toSeq == Seq("doc_id", "text"),
        "the catalog schema must roll back across the DDL")
      // history preserved: v3 still time-travels
      assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 3")
        .as[Long].head() == 31L)
      // TIMESTAMP AS OF: the first commit's stamp resolves to v1-content
      spark.sql(s"RESTORE TABLE $tbl TO TIMESTAMP AS OF " +
        s"'${new java.sql.Timestamp(ts1)}'")
      assert(spark.table(tbl).count() == 30L)
      // refusals surface as AnalysisException
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 99"))
      assert(e.getMessage.contains("not committed"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SHALLOW CLONE references the source's files at a version (zero " +
    "bytes copied), registers an identifier target at its managed " +
    "location, and the clone's own commits never touch the source") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 50L).map(i => (i, i % 5)).toDF("id", "grp"), "ingest")
    SnapshotStore.commitAppend(spark, dir,
      (51L to 60L).map(i => (i, i % 5)).toDF("id", "grp"), "append")
    // quoted-path target, pinned source version
    val target = freshDir()
    val out = spark.sql(
      s"CREATE TABLE '$target' SHALLOW CLONE '$dir' VERSION AS OF 1")
      .collect()
    assert(out(0).getString(0) == target && out(0).getLong(1) == 1L)
    assert(SnapshotStore.read(spark, target).count() == 50L,
      "the clone pins the named source version")
    val cloneM = SnapshotStore.manifest(spark, target, 1L)
    assert(cloneM.files.forall(_.contains(dir)),
      "shallow clone REFERENCES source files — zero bytes copied")
    // the clone's own append lands under ITS directory
    SnapshotStore.commitAppend(spark, target,
      Seq((100L, 0L)).toDF("id", "grp"), "append")
    assert(SnapshotStore.read(spark, target).count() == 51L)
    assert(SnapshotStore.read(spark, dir).count() == 60L,
      "the source never sees the clone's commits")
    // identifier target registers and reads through the catalog
    val tbl = "graft_clone_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // DROP TABLE removes the catalog entry but not the managed dir — a
    // prior run's leftover location must not refuse this one
    val managed = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl))
    val mfs = new org.apache.hadoop.fs.Path(managed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    mfs.delete(new org.apache.hadoop.fs.Path(managed), true)
    try {
      spark.sql(s"CREATE TABLE $tbl SHALLOW CLONE '$dir'")
      assert(spark.table(tbl).count() == 60L)
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"CREATE TABLE $tbl SHALLOW CLONE '$dir'"))
      assert(e.getMessage.contains("already exists"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // DEEP CLONE copies the bytes — no source references
    val deepT = freshDir()
    spark.sql(s"CREATE TABLE '$deepT' DEEP CLONE '$dir'")
    val deepM = SnapshotStore.manifest(spark, deepT, 1L)
    assert(deepM.files.forall(!_.contains(dir)),
      "deep clone holds its own files")
    assert(SnapshotStore.read(spark, deepT).count() == 60L)
  }

  test("DESCRIBE DETAIL summarizes the latest manifest without a data " +
    "scan: files, bytes, DV rows, layout, and properties") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 40L).map(i => (i, i % 4)).toDF("id", "p").repartition(4),
      "ingest", partitionBy = Seq("p"),
      tblProperties = Map("team" -> "curation"))
    SnapshotStore.deleteWhereDv(spark, dir,
      SnapshotStore.FilePredicate.EqTo("id", 7L))
    val row = spark.sql(s"DESCRIBE DETAIL '$dir'").collect()(0)
    assert(row.getString(0) == "graft-snapshot" && row.getString(1) == dir)
    assert(row.getLong(2) == 2L && row.getString(3) == "delete-dv")
    val m = SnapshotStore.manifest(spark, dir, 2L)
    assert(row.getLong(5) == m.files.size.toLong)
    assert(row.getLong(6) == m.stats.values.map(_.bytes).sum && row.getLong(6) > 0L)
    assert(row.getLong(7) == 1L, "one DV-masked row")
    assert(row.getSeq[String](8) == Seq("p"))
    assert(row.getMap[String, String](10).get("team").contains("curation"))
    // the registered-table form resolves through the catalog
    val tbl = "graft_detail_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
      assert(spark.sql(s"DESCRIBE DETAIL $tbl").collect()(0)
        .getLong(2) == 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // a non-snapshot identifier refuses loudly
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("DESCRIBE DETAIL not_a_snapshot_table"))
    assert(e.getMessage.contains("not a registered graft-snapshot"))
  }
}
