package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the SQL DML front door ([[SnapshotDmlRule]]): DELETE FROM
  * and MERGE INTO over a `USING graft-snapshot` table route to the
  * store's copy-on-write commits — same null semantics, same file-grain
  * write-side skipping, loud refusal of shapes the store cannot honor. */
class SnapshotDmlSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapdml").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def withTable(name: String, dir: String)(body: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-snapshot` OPTIONS (path '$dir')")
    try body finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("DELETE FROM commits a copy-on-write delete version; clean files carry") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 400L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartitionByRange(8, col("doc_id")), "ingest")
    val before = SnapshotStore.manifest(spark, dir, 1L)
    withTable("dml_del", dir) {
      spark.sql("DELETE FROM dml_del WHERE doc_id BETWEEN 90 AND 110")
      val v = SnapshotStore.latestVersion(spark, dir).get
      assert(v == 2L)
      val after = SnapshotStore.manifest(spark, dir, v)
      assert(after.operation == "delete")
      // the condition lowered to FilePredicates: off-range files CARRIED
      val carried = after.files.toSet.intersect(before.files.toSet)
      assert(carried.size >= 6,
        s"a narrow SQL DELETE must carry most files: ${carried.size} of 8")
      assert(SnapshotStore.read(spark, dir)
        .select("doc_id").as[Long].collect().toSet ==
        ((1L to 89L) ++ (111L to 400L)).toSet)
    }
  }

  test("DELETE FROM keeps null-predicate rows (SQL semantics) and handles untranslatable conditions") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, Option("aa")), (2L, Option.empty[String]), (3L, Option("xyz")))
        .toDF("doc_id", "tag"), "ingest")
    withTable("dml_del2", dir) {
      // length(tag) has no stats translation: every file rewrites, but
      // the answer is exact and null rows survive
      spark.sql("DELETE FROM dml_del2 WHERE length(tag) = 3")
      assert(SnapshotStore.read(spark, dir)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    }
  }

  test("MERGE INTO upserts: same-key rows replaced, new keys appended") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 100L).map(i => (i, s"v1-$i")).toDF("doc_id", "text")
        .repartitionByRange(4, col("doc_id")), "ingest")
    Seq((50L, "UPD"), (101L, "NEW")).toDF("doc_id", "text")
      .createOrReplaceTempView("dml_updates")
    withTable("dml_mrg", dir) {
      spark.sql(
        """MERGE INTO dml_mrg t USING dml_updates s ON t.doc_id = s.doc_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = SnapshotStore.read(spark, dir)
        .as[(Long, String)].collect().toMap
      assert(got.size == 101)
      assert(got(50L) == "UPD" && got(101L) == "NEW" && got(1L) == "v1-1")
      assert(SnapshotStore.manifest(spark, dir,
        SnapshotStore.latestVersion(spark, dir).get).operation == "merge")
    }
  }

  test("MERGE INTO with explicit aligned assignments (the SET c = s.c spelling) works too") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "ingest")
    Seq((2L, "B2"), (3L, "c")).toDF("doc_id", "text")
      .createOrReplaceTempView("dml_src2")
    withTable("dml_mrg2", dir) {
      spark.sql(
        """MERGE INTO dml_mrg2 t USING dml_src2 s ON t.doc_id = s.doc_id
          |WHEN MATCHED THEN UPDATE SET doc_id = s.doc_id, text = s.text
          |WHEN NOT MATCHED THEN INSERT (doc_id, text) VALUES (s.doc_id, s.text)
          |""".stripMargin)
      assert(SnapshotStore.read(spark, dir).as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "B2"), (3L, "c")))
    }
  }

  test("unsupported MERGE shapes refuse loudly, committing nothing") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    Seq((1L, "A2")).toDF("doc_id", "text").createOrReplaceTempView("dml_src3")
    withTable("dml_mrg3", dir) {
      val e = intercept[RuntimeException] {
        spark.sql(
          """MERGE INTO dml_mrg3 t USING dml_src3 s ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage.contains("graft-snapshot MERGE INTO supports"))
      assert(SnapshotStore.latestVersion(spark, dir).contains(1L),
        "a refused merge must not commit")
    }
  }

  test("DML on a non-snapshot table is untouched by the rule") {
    Seq((1L, "a")).toDF("doc_id", "text").createOrReplaceTempView("plain_v")
    // DELETE against a temp view still fails with Spark's own error, not ours
    val e = intercept[Exception] {
      spark.sql("DELETE FROM plain_v WHERE doc_id = 1")
    }
    assert(!e.getMessage.contains("graft-snapshot"))
  }
}
