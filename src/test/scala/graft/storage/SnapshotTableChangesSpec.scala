package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the SQL `table_changes` table-valued function (round 19
  * — the Delta CDF TVF over this engine's boundary-diff change feed):
  * keys come from the table's `graft.cdfKeys` declaration, the second
  * boundary defaults to the latest version, registered-name and
  * quoted-path forms both resolve, refusals are typed
  * AnalysisExceptions, and the streaming CDF source falls back to the
  * same declared keys when no idCols option is passed. */
class SnapshotTableChangesSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snaptvf").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("table_changes: name + path forms over declared graft.cdfKeys; " +
    "boundary-diff vocabulary; default end = latest; API parity") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("doc_id", "txt", "n"),
      "ingest", tblProperties = Map("graft.cdfKeys" -> "doc_id"))
    val tbl = "tvf_t1"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      spark.sql(s"INSERT INTO $tbl VALUES (4, 'd', 40)")          // v2
      spark.sql(s"UPDATE $tbl SET n = n * 2 WHERE doc_id = 2")    // v3
      spark.sql(s"DELETE FROM $tbl WHERE doc_id = 1")             // v4
      val got = spark.sql(
        s"SELECT _change_type, doc_id, txt, n FROM table_changes('$tbl', 1, 4)")
        .as[(String, Long, String, Long)].collect().toSet
      assert(got == Set(
        ("insert", 4L, "d", 40L),
        ("update_preimage", 2L, "b", 20L),
        ("update_postimage", 2L, "b", 40L),
        ("delete", 1L, "a", 10L)),
        s"boundary diff 1->4 vocabulary, got $got")
      // default end = latest; quoted-path form resolves the same table
      assert(spark.sql(s"SELECT * FROM table_changes('$tbl', 1)")
        .count() == 4L)
      assert(spark.sql(s"SELECT * FROM table_changes('$dir', 1, 4)")
        .count() == 4L, "the quoted-path form works without a catalog entry")
      // intermediate boundary: only the delete separates v3 from v4
      assert(spark.sql(
        s"SELECT _change_type FROM table_changes('$tbl', 3, 4)")
        .as[String].collect().toSeq == Seq("delete"))
      // parity with the API face
      val api = SnapshotStore.readTableChanges(spark, dir, 1L, Some(4L))
        .as[(Long, String, Long, String)].collect().toSet
      assert(api.map(r => (r._4, r._1, r._2, r._3)) == got)
      // TVF output composes into ordinary SQL (joins/filters/aggregates)
      assert(spark.sql(
        s"""SELECT CAST(sum(n) AS BIGINT) FROM table_changes('$tbl', 1, 4)
           |WHERE _change_type = 'update_postimage'""".stripMargin)
        .as[Long].head() == 40L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("table_changes refusals are typed: undeclared keys name the " +
    "remedy, bad arities/literals/ranges/targets refuse, and the " +
    "property validator rejects an empty key list") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a")).toDF("doc_id", "txt"), "ingest")
    SnapshotStore.commitAppend(spark, dir,
      Seq((2L, "b")).toDF("doc_id", "txt"), "append")
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(sql).collect())
      assert(e.getMessage.contains(needle),
        s"want '$needle' in: ${e.getMessage}")
    }
    refuses(s"SELECT * FROM table_changes('$dir', 1, 2)", "graft.cdfKeys")
    refuses(s"SELECT * FROM table_changes('$dir')", "takes")
    refuses(s"SELECT * FROM table_changes('$dir', 1, 2, 3)", "takes")
    refuses(s"SELECT * FROM table_changes('$dir', 'one', 2)", "integral")
    refuses("SELECT * FROM table_changes('no_such_table', 1, 2)",
      "neither a registered")
    SnapshotStore.setTableProperties(spark, dir,
      Map("graft.cdfKeys" -> "doc_id"))
    refuses(s"SELECT * FROM table_changes('$dir', 2, 2)", "fromVersion")
    refuses(s"SELECT * FROM table_changes('$dir', 1, 99)", "latest")
    // now legal
    assert(spark.sql(s"SELECT * FROM table_changes('$dir', 1, 3)")
      .count() == 1L)
    val e = intercept[SnapshotStore.SnapshotPropertyException](
      SnapshotStore.setTableProperties(spark, dir,
        Map("graft.cdfKeys" -> " , ")))
    assert(e.getMessage.contains("key column list"))
  }

  test("table_changes TIMESTAMP boundaries resolve to the version " +
    "committed at or before the instant; pre-history instants refuse") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a")).toDF("doc_id", "txt"), "ingest",
      tblProperties = Map("graft.cdfKeys" -> "doc_id"))
    SnapshotStore.commitAppend(spark, dir,
      Seq((2L, "b")).toDF("doc_id", "txt"), "append")
    SnapshotStore.commitAppend(spark, dir,
      Seq((3L, "c")).toDF("doc_id", "txt"), "append")
    def tsOf(v: Long): String =
      new java.sql.Timestamp(
        SnapshotStore.commitInfo(spark, dir, v)._2).toString
    // boundary strings at v1/v2's own commit instants → diff 1→2
    val got = spark.sql(
      s"SELECT _change_type, doc_id FROM table_changes('$dir', " +
        s"'${tsOf(1L)}', '${tsOf(2L)}')")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("insert", 2L)), s"ts-boundary diff 1->2, got $got")
    // mixed forms compose (version from, timestamp to = latest commit)
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('$dir', 1, '${tsOf(3L)}')")
      .head().getLong(0) == 2L)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT * FROM table_changes('$dir', " +
        "'1990-01-01', 2)").collect())
    assert(e.getMessage.contains("precedes every retained"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT * FROM table_changes('$dir', " +
        "'not-a-time', 2)").collect())
    assert(e2.getMessage.contains("timestamp"))
  }

  test("the streaming CDF source falls back to graft.cdfKeys when no " +
    "idCols option is passed; without either it refuses with the remedy") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "txt"), "ingest",
      tblProperties = Map("graft.cdfKeys" -> "doc_id"))
    val got = scala.collection.mutable.Set.empty[(Long, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("tvf-ckpt").toString
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true") // NO idCols: the property serves
      .load(dir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.as[(Long, String, String)].collect(); ()
      }.start()
    q.processAllAvailable()
    SnapshotStore.merge(spark, dir,
      Seq((2L, "B"), (3L, "c")).toDF("doc_id", "txt"), Seq("doc_id"))
    q.processAllAvailable()
    q.stop()
    assert(got == Set((1L, "a", "insert"), (2L, "b", "insert"),
      (2L, "b", "update_preimage"), (2L, "B", "update_postimage"),
      (3L, "c", "insert")), s"property-keyed CDF stream, got $got")

    val dir2 = freshDir()
    SnapshotStore.commit(spark, dir2,
      Seq((1L, "a")).toDF("doc_id", "txt"), "ingest")
    val e = intercept[Exception] {
      val q2 = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(dir2)
        .writeStream.option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tvf-ckpt2").toString)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try { q2.processAllAvailable(); q2.awaitTermination() }
      finally q2.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("graft.cdfKeys")),
      s"the refusal must name the declaration remedy: ${causes(e).map(_.getMessage)}")
  }
}
