package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of EXPRESSION COLUMN DEFAULTS (round 19 — the
  * `graft.generated.<col>` declarations): writer-authored faces
  * (commit, append, SQL INSERT, merge DELTA side) compute a declared
  * column when the writer omits it or leaves it null; explicit
  * non-null values win; carried/rewritten rows are NEVER backfilled
  * (content-neutral rewrites stay content-neutral); Delta-strict
  * GENERATED ALWAYS equality composes as an opt-in CHECK constraint;
  * RENAME/DROP of a referenced column refuses; bad declarations refuse
  * at the SET. */
class SnapshotGeneratedDefaultsSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapgen").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("declared defaults compute on commit/append/INSERT when the " +
    "column is absent or null; explicit non-null values win") {
    val dir = freshDir()
    // the column is NOT in the writing frame at all — born generated
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b"), (17L, "q")).toDF("doc_id", "txt"),
      "ingest",
      tblProperties = Map("graft.generated.bucket" -> "doc_id % 16"))
    val v1 = SnapshotStore.read(spark, dir)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert(v1 == Map(1L -> 1L, 2L -> 2L, 17L -> 1L),
      "an absent declared column computes outright")
    // append WITH the column: non-null wins, null computes
    SnapshotStore.commitAppend(spark, dir,
      Seq((20L, "c", java.lang.Long.valueOf(99L)),
          (21L, "d", null.asInstanceOf[java.lang.Long]))
        .toDF("doc_id", "txt", "bucket"), "append")
    val v2 = SnapshotStore.read(spark, dir)
      .filter(col("doc_id") >= 20L)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    assert(v2 == Map(20L -> 99L, 21L -> 5L),
      s"explicit value wins, null fills from the expression: $v2")
    // SQL INSERT with a COLUMN LIST omitting the generated column:
    // the null-fill alignment + default compose
    val tbl = "gen_t1"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      spark.sql(s"INSERT INTO $tbl (doc_id, txt) VALUES (33, 'e')")
      assert(spark.sql(s"SELECT bucket FROM $tbl WHERE doc_id = 33")
        .as[Long].head() == 1L,
        "INSERT omitting the column in its list still computes it")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("merge computes defaults on the DELTA side only; carried and " +
    "rewritten rows are never backfilled (pre-declaration nulls stay)") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "txt"), "ingest")
    // declare the default AFTER rows exist without the column
    SnapshotStore.setTableProperties(spark, dir,
      Map("graft.generated.bucket" -> "doc_id % 16"))
    // upsert touches doc 2's file: the delta row computes; doc 1 is
    // REWRITTEN as a survivor and must keep its evolution-null
    SnapshotStore.merge(spark, dir,
      Seq((2L, "B")).toDF("doc_id", "txt"), Seq("doc_id"))
    val got = SnapshotStore.read(spark, dir)
      .select(col("doc_id"), col("txt"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got == Set((1L, "a", None), (2L, "B", Some(2L))),
      s"delta computes, survivors keep their nulls: $got")
    // a compaction rewrite stays CONTENT-NEUTRAL: still no backfill
    SnapshotStore.compact(spark, dir)
    val after = SnapshotStore.read(spark, dir)
      .filter(col("doc_id") === 1L).select("bucket").head()
    assert(after.isNullAt(0),
      "rewrites must never backfill a carried row's null")
  }

  test("Delta-strict GENERATED ALWAYS composes as an opt-in CHECK; " +
    "RENAME/DROP of a referenced column refuses; bad declarations " +
    "refuse at the SET") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a")).toDF("doc_id", "txt"), "ingest",
      tblProperties = Map("graft.generated.bucket" -> "doc_id % 16"))
    SnapshotStore.setTableProperties(spark, dir,
      Map("graft.constraints.gen_bucket" -> "bucket <=> doc_id % 16"))
    // a writer-supplied WRONG value now refuses wholesale
    val e = intercept[SnapshotStore.ConstraintViolationException](
      SnapshotStore.commitAppend(spark, dir,
        Seq((2L, "b", 99L)).toDF("doc_id", "txt", "bucket"), "append"))
    assert(e.getMessage.contains("gen_bucket"))
    // the computed path still passes the strict check
    SnapshotStore.commitAppend(spark, dir,
      Seq((3L, "c")).toDF("doc_id", "txt"), "append")
    assert(SnapshotStore.read(spark, dir).count() == 2L)
    // RENAME/DROP of the referenced column refuses, naming the default
    val e2 = intercept[Exception](SnapshotStore.renameColumn(spark, dir,
      "doc_id", "id"))
    assert(e2.getMessage.contains("expression-default:bucket"),
      s"rename guard must name the default: ${e2.getMessage}")
    val e3 = intercept[Exception](SnapshotStore.dropColumns(spark, dir,
      Seq("doc_id")))
    assert(e3.getMessage.contains("expression-default:bucket"))
    // declarations validate: empty and unparseable refuse at the SET
    val e4 = intercept[SnapshotStore.SnapshotPropertyException](
      SnapshotStore.setTableProperties(spark, dir,
        Map("graft.generated.x" -> "  ")))
    assert(e4.getMessage.contains("expression"))
    val e5 = intercept[SnapshotStore.SnapshotPropertyException](
      SnapshotStore.setTableProperties(spark, dir,
        Map("graft.generated.x" -> "not ))) sql")))
    assert(e5.getMessage.contains("unparseable"))
  }

  test("the date-partition pattern: a hive-partitioned table over a " +
    "GENERATED string column routes omitted-writer rows to their " +
    "partitions and partition-prunes") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "en body"), (2L, "de text"), (3L, "en more"))
        .toDF("doc_id", "txt"),
      "ingest",
      partitionBy = Seq("family"),
      tblProperties =
        Map("graft.generated.family" -> "substring(txt, 1, 2)"))
    SnapshotStore.commitAppend(spark, dir,
      Seq((4L, "de neu")).toDF("doc_id", "txt"), "append")
    val m = SnapshotStore.manifest(spark, dir, 2L)
    assert(m.partitionCols == Seq("family"))
    assert(m.files.forall(_.contains("family=")),
      "generated partition values live in the hive layout")
    val (df, idx) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, 2L)
    assert(df.filter(col("family") === "de")
      .select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
    assert(idx.lastPartitionPruned > 0,
      "partition pruning fires on the generated column")
  }
}
