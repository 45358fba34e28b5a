package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the SQL DDL story (round 17): `ALTER TABLE ... ADD
  * COLUMNS` as a zero-data-rewrite metadata commit (catalog schema kept
  * in lockstep for registered tables), CTAS through the registered
  * source, and the refusal surface (`AnalysisException`, never a bare
  * RuntimeException, on duplicate/case-colliding columns). */
class SnapshotDdlSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapddl").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("ALTER TABLE ADD COLUMNS is a metadata-only commit: zero data " +
    "bytes move, old rows null-fill, INSERT across the evolution works, " +
    "and the registered catalog face resolves the new shape immediately") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest")
    val filesBefore = SnapshotStore.manifest(spark, dir, 1L).files
    val tbl = "graft_ddl_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (quality BIGINT, tag STRING)")
      val m2 = SnapshotStore.manifest(spark, dir, 2L)
      assert(m2.operation == "add-columns")
      assert(m2.files == filesBefore, "zero data files may move")
      assert(m2.schemaStruct.get.fieldNames.toSeq ==
        Seq("doc_id", "text", "quality", "tag"))
      // catalog face sees the evolved shape at once; old rows null-fill
      val viaSql = spark.sql(s"SELECT count(*) FROM $tbl WHERE quality IS NULL")
        .as[Long].head()
      assert(viaSql == 50L)
      // write across the evolution, read the mix back
      spark.sql(s"INSERT INTO $tbl VALUES (100, 'new', 7, 'good')")
      val got = spark.sql(
        s"SELECT count(*), count(quality), sum(quality) FROM $tbl")
        .as[(Long, Long, Long)].head()
      assert(got == ((51L, 1L, 7L)))
      // time travel to BEFORE the evolution: the old schema, old shape
      assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
        .columns.toSeq == Seq("doc_id", "text"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("ADD COLUMNS on a quoted path works without a catalog entry; the " +
    "log entry is a pure-header delta (no adds/removes)") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 10L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest")
    spark.sql(s"ALTER TABLE '$dir' ADD COLUMN (score DOUBLE)")
    val m = SnapshotStore.manifest(spark, dir, 2L)
    assert(m.schemaStruct.get.fieldNames.contains("score"))
    assert(SnapshotStore.read(spark, dir)
      .filter(col("score").isNull).count() == 10L)
    // commit bytes O(schema): far smaller than the self-contained v1
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def len(v: Long) = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      f"$dir/_manifests/v$v%08d.json")).getLen
    assert(len(2L) < len(1L), "a metadata commit must not restate files")
  }

  test("duplicate and case-colliding ADD COLUMNS refuse as " +
    "AnalysisException; non-snapshot ALTER TABLE falls through to Spark") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"ALTER TABLE '$dir' ADD COLUMNS (text STRING)")
    }
    assert(e1.getMessage.contains("already exists"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"ALTER TABLE '$dir' ADD COLUMNS (TEXT BIGINT)")
    }
    assert(e2.getMessage.contains("already exists"),
      "case-colliding spellings must refuse under case-insensitive analysis")
    assert(SnapshotStore.versions(spark, dir) == Seq(1L),
      "refused DDL commits nothing")
    // a non-snapshot target keeps Spark's own ALTER TABLE behavior
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite")
      .saveAsTable("graft_ddl_plain")
    try {
      spark.sql("ALTER TABLE graft_ddl_plain ADD COLUMNS (c INT)")
      assert(spark.table("graft_ddl_plain").columns.toSeq ==
        Seq("a", "b", "c"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ddl_plain")
  }

  test("CTAS: CREATE TABLE ... USING graft-snapshot AS SELECT commits the " +
    "query as version 1 and registers a queryable, mutable table") {
    val dir = freshDir()
    (1L to 30L).map(i => (i, s"t$i", i % 3)).toDF("doc_id", "text", "grp")
      .createOrReplaceTempView("graft_ctas_src")
    val tbl = "graft_ctas_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      spark.sql(
        s"""CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')
           |AS SELECT doc_id, text FROM graft_ctas_src WHERE grp = 0""".stripMargin)
      assert(SnapshotStore.versions(spark, dir) == Seq(1L))
      assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 10L)
      // the CTAS table is a full citizen: DML + time travel work
      spark.sql(s"DELETE FROM $tbl WHERE doc_id = 3")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").as[Long].head() == 9L)
      assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
        .as[Long].head() == 10L)
      // CTAS onto an occupied location refuses loudly — Spark's own
      // non-empty-location guard fires before the provider's
      // ErrorIfExists contract would
      val e = intercept[Exception] {
        spark.sql(s"""CREATE TABLE graft_ctas_other USING `graft-snapshot`
          |OPTIONS (path '$dir') AS SELECT 1L AS doc_id, 'x' AS text""".stripMargin)
      }
      assert(e.getMessage.contains("non-empty directory") ||
        e.getMessage.contains("already has committed versions"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql("DROP TABLE IF EXISTS graft_ctas_other")
    }
  }
}
