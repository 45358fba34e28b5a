package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Contract of TABLE PROPERTIES, table-level CHECK constraints, and the
  * per-table checkpoint interval (round 18):
  *
  *  - `SET`/`UNSET TBLPROPERTIES` are metadata-only commits; properties
  *    carry through every commit (appends, overwrites, maintenance) and
  *    RESTORE restores them; unknown `graft.*` keys refuse loudly;
  *  - `graft.bloomColumns` declared purely via SQL drives per-file
  *    bloom collection (point-skipping with zero API calls);
  *  - `graft.checkpointInterval` re-paces the periodic checkpoint and
  *    mixed intervals reconstruct soundly;
  *  - CHECK constraints validate existing rows at ADD and every write
  *    face afterwards — a violating commit refuses WHOLESALE (nothing
  *    lands), null passes (SQL CHECK semantics), DROP CONSTRAINT
  *    retires enforcement.
  */
class SnapshotPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapprops").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def seed(dir: String, n: Long = 100L): Unit =
    SnapshotStore.commit(spark, dir,
      (1L to n).map(i => (i, s"t$i", i % 7)).toDF("doc_id", "text", "score"),
      "ingest")

  test("SET TBLPROPERTIES is a metadata-only commit; properties carry " +
    "through append/overwrite/optimize; UNSET removes; RESTORE restores " +
    "the target version's map") {
    val dir = freshDir()
    seed(dir)
    val files1 = SnapshotStore.manifest(spark, dir, 1L).files
    SnapshotStore.setTableProperties(spark, dir,
      Map("team" -> "curation", "graft.checkpointInterval" -> "10")) // v2
    val m2 = SnapshotStore.manifest(spark, dir, 2L)
    assert(m2.operation == "set-tblproperties")
    assert(m2.files == files1, "zero data files may move")
    assert(m2.properties == Map("team" -> "curation",
      "graft.checkpointInterval" -> "10"))
    // carries through an append, a full-snapshot overwrite, a compact
    SnapshotStore.commitAppend(spark, dir,
      Seq((500L, "x", 0L)).toDF("doc_id", "text", "score"), "append") // v3
    SnapshotStore.commit(spark, dir,
      (1L to 10L).map(i => (i, s"n$i", i)).toDF("doc_id", "text", "score"),
      "rewrite")                                                      // v4
    SnapshotStore.compact(spark, dir)                                 // v5
    assert(SnapshotStore.manifest(spark, dir, 5L).properties ==
      m2.properties, "properties survive append, overwrite, compact")
    SnapshotStore.unsetTableProperties(spark, dir, Seq("team"))       // v6
    assert(SnapshotStore.manifest(spark, dir, 6L).properties ==
      Map("graft.checkpointInterval" -> "10"))
    SnapshotStore.restore(spark, dir, 2L)                             // v7
    assert(SnapshotStore.manifest(spark, dir, 7L).properties ==
      m2.properties, "RESTORE restores the target version's properties")
  }

  test("unknown graft.* keys and malformed knob values refuse loudly; " +
    "key spelling normalizes case-insensitively") {
    val dir = freshDir()
    seed(dir, 10L)
    intercept[SnapshotStore.SnapshotPropertyException] {
      SnapshotStore.setTableProperties(spark, dir,
        Map("graft.checkpontInterval" -> "5")) // typo'd knob
    }
    intercept[SnapshotStore.SnapshotPropertyException] {
      SnapshotStore.setTableProperties(spark, dir,
        Map("graft.checkpointInterval" -> "zero"))
    }
    intercept[SnapshotStore.SnapshotPropertyException] {
      SnapshotStore.setTableProperties(spark, dir,
        Map("graft.checkpointInterval" -> "0"))
    }
    // lowercased spelling lands under the canonical key
    SnapshotStore.setTableProperties(spark, dir,
      Map("graft.checkpointinterval" -> "4"))
    val m = SnapshotStore.manifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get)
    assert(m.properties == Map("graft.checkpointInterval" -> "4"))
  }

  test("graft.bloomColumns declared purely via SQL SET TBLPROPERTIES " +
    "drives bloom collection on later files → point-skipping prunes") {
    val dir = freshDir()
    seed(dir, 10L)
    spark.sql(s"ALTER TABLE '$dir' SET TBLPROPERTIES " +
      s"('graft.bloomColumns'='doc_id')") // v2
    val m2 = SnapshotStore.manifest(spark, dir, 2L)
    assert(m2.bloomCols == Seq("doc_id"),
      "the property flows into the operational bloom declaration")
    assert(m2.properties("graft.bloomColumns") == "doc_id")
    // later files collect blooms; an equality probe prunes them
    (0 until 6).foreach(i => SnapshotStore.commitAppend(spark, dir,
      (1000L + i * 100 to 1049L + i * 100).map(j => (j, s"t$j", j % 7))
        .toDF("doc_id", "text", "score"), s"append-$i"))
    val v = SnapshotStore.latestVersion(spark, dir).get
    val m = SnapshotStore.manifest(spark, dir, v)
    val withBlooms = m.files.count(f =>
      m.stats.get(f).exists(_.blooms.contains("doc_id")))
    assert(withBlooms >= 6, s"appended files must carry blooms ($withBlooms)")
    val pruned = SnapshotStore.prunedFiles(spark, dir, v,
      SnapshotStore.FilePredicate.EqTo("doc_id", 1234567L))
    assert(pruned.length < m.files.length,
      "a definite-absent probe must prune bloom-carrying files")
  }

  test("graft.checkpointInterval re-paces the periodic checkpoint; " +
    "mixed intervals across history reconstruct soundly") {
    val dir = freshDir()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ckpt(v: Long) = fs.exists(
      new Path(f"$dir/_manifests/v$v%08d.ckpt.json"))
    seed(dir, 20L)                                                    // v1
    SnapshotStore.setTableProperties(spark, dir,
      Map("graft.checkpointInterval" -> "3"))                         // v2
    (3L to 9L).foreach(v => SnapshotStore.commitAppend(spark, dir,
      Seq((v * 100, s"x$v", 0L)).toDF("doc_id", "text", "score"),
      s"append-$v"))                                                  // v3..v9
    assert(ckpt(3L) && ckpt(6L) && ckpt(9L),
      "interval 3 must checkpoint at every 3rd version")
    assert(!ckpt(4L) && !ckpt(5L) && !ckpt(7L) && !ckpt(8L))
    // back to the default cadence; versions keep reconstructing
    SnapshotStore.unsetTableProperties(spark, dir,
      Seq("graft.checkpointInterval"))                                // v10
    (11L to 12L).foreach(v => SnapshotStore.commitAppend(spark, dir,
      Seq((v * 100, s"x$v", 0L)).toDF("doc_id", "text", "score"),
      s"append-$v"))
    assert(ckpt(10L), "v10 rides the DEFAULT interval again")
    (1L to 12L).foreach(v =>
      assert(SnapshotStore.manifest(spark, dir, v).version == v))
    assert(SnapshotStore.read(spark, dir).count() == 20L + 7L + 2L)
  }

  test("ADD CONSTRAINT validates the CURRENT rows (a violating table " +
    "refuses the constraint); afterwards EVERY write face refuses a " +
    "violating commit wholesale — nothing lands") {
    val dir = freshDir()
    seed(dir)
    // current rows all have score in [0, 6] — a tighter check refuses
    val e0 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"ALTER TABLE '$dir' ADD CONSTRAINT pos CHECK (score > 3)")
    }
    assert(e0.getMessage.contains("violates CHECK constraint"))
    assert(SnapshotStore.latestVersion(spark, dir).contains(1L),
      "a refused ADD CONSTRAINT commits nothing")
    spark.sql(s"ALTER TABLE '$dir' ADD CONSTRAINT pos CHECK (score >= 0)")
    assert(SnapshotStore.manifest(spark, dir, 2L)
      .properties("graft.constraints.pos") == "score >= 0")
    // duplicate name refuses
    val eDup = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"ALTER TABLE '$dir' ADD CONSTRAINT pos CHECK (score >= 1)")
    }
    assert(eDup.getMessage.contains("already exists"))
    // API append of a violating batch refuses atomically
    intercept[SnapshotStore.ConstraintViolationException] {
      SnapshotStore.commitAppend(spark, dir,
        Seq((900L, "bad", -5L)).toDF("doc_id", "text", "score"), "append")
    }
    assert(SnapshotStore.latestVersion(spark, dir).contains(2L),
      "the violating append must commit NOTHING")
    assert(SnapshotStore.read(spark, dir).count() == 100L)
    // merge with a violating delta refuses too
    intercept[SnapshotStore.ConstraintViolationException] {
      SnapshotStore.merge(spark, dir,
        Seq((5L, "upd", -1L)).toDF("doc_id", "text", "score"), Seq("doc_id"))
    }
    // SQL UPDATE whose post-image violates refuses (CoW and DV alike)
    intercept[SnapshotStore.ConstraintViolationException] {
      SnapshotStore.updateCondition(spark, dir, col("doc_id") === 7L,
        Some(SnapshotStore.FilePredicate.EqTo("doc_id", 7L)),
        Seq("score" -> lit(-9L)))
    }
    intercept[SnapshotStore.ConstraintViolationException] {
      SnapshotStore.updateConditionDv(spark, dir, col("doc_id") === 7L,
        Some(SnapshotStore.FilePredicate.EqTo("doc_id", 7L)),
        Seq("score" -> lit(-9L)))
    }
    assert(SnapshotStore.read(spark, dir)
      .filter(col("score") < 0).count() == 0L)
    // a PASSING write lands; null PASSES the check (SQL semantics)
    SnapshotStore.commitAppend(spark, dir,
      Seq((901L, "ok", Some(3L)), (902L, "null-score", None))
        .toDF("doc_id", "text", "score"), "append")
    assert(SnapshotStore.read(spark, dir).count() == 102L)
    // DROP CONSTRAINT retires enforcement
    spark.sql(s"ALTER TABLE '$dir' DROP CONSTRAINT pos")
    SnapshotStore.commitAppend(spark, dir,
      Seq((903L, "now-fine", -1L)).toDF("doc_id", "text", "score"), "append")
    assert(SnapshotStore.read(spark, dir).count() == 103L)
    // IF EXISTS tempers the unknown-name refusal
    spark.sql(s"ALTER TABLE '$dir' DROP CONSTRAINT IF EXISTS nope")
    val eMiss = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"ALTER TABLE '$dir' DROP CONSTRAINT nope")
    }
    assert(eMiss.getMessage.contains("does not exist"))
  }

  test("a constraint on a column the delta OMITS null-fills (null " +
    "passes); the streaming sink face enforces too") {
    val dir = freshDir()
    seed(dir, 10L)
    SnapshotStore.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("quality",
        org.apache.spark.sql.types.LongType)))                        // v2
    spark.sql(
      s"ALTER TABLE '$dir' ADD CONSTRAINT q CHECK (quality >= 0)")    // v3
    // merge delta WITHOUT the quality column: null-fills, null passes
    SnapshotStore.merge(spark, dir,
      Seq((3L, "upd", 1L)).toDF("doc_id", "text", "score"),
      Seq("doc_id"))                                                  // v4
    assert(SnapshotStore.read(spark, dir).count() == 10L)
    // violating rows through the registered streaming sink refuse
    val sink = new SnapshotSink(spark, dir, Seq.empty, Seq.empty, Seq.empty)
    intercept[SnapshotStore.ConstraintViolationException] {
      sink.addBatch(0L,
        Seq((800L, "bad", 0L, -2L)).toDF("doc_id", "text", "score", "quality"))
    }
    assert(SnapshotStore.read(spark, dir).count() == 10L,
      "the violating micro-batch must commit nothing")
  }

  test("SQL TBLPROPERTIES round-trip: CTAS declares graft.bloomColumns, " +
    "SHOW TBLPROPERTIES reads the manifest, the catalog entry carries " +
    "the property, and point-skipping fires — all with zero API calls") {
    val dir = freshDir()
    (1L to 400L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .repartition(8, col("doc_id"))
      .createOrReplaceTempView("props_ctas_src")
    val tbl = "graft_props_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      spark.sql(
        s"""CREATE TABLE $tbl USING `graft-snapshot`
           |OPTIONS (path '$dir')
           |TBLPROPERTIES ('graft.bloomColumns'='doc_id', 'dept'='data-eng')
           |AS SELECT doc_id, text FROM props_ctas_src""".stripMargin)
      val m = SnapshotStore.manifest(spark, dir, 1L)
      assert(m.bloomCols == Seq("doc_id"),
        "the TBLPROPERTIES declaration must reach the manifest")
      assert(m.properties.get("graft.bloomColumns").contains("doc_id"))
      assert(m.files.exists(f => m.stats(f).blooms.contains("doc_id")),
        "version 1's files must carry blooms")
      // SHOW TBLPROPERTIES serves the manifest's map
      val shown = spark.sql(s"SHOW TBLPROPERTIES $tbl")
        .as[(String, String)].collect().toMap
      assert(shown.get("graft.bloomColumns").contains("doc_id"))
      // the catalog entry carries it too (round-trip)
      val catProps = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
        .properties
      assert(catProps.get("graft.bloomColumns").contains("doc_id"))
      // point-skipping fires on the SQL-declared column
      val pruned = SnapshotStore.prunedFiles(spark, dir, 1L,
        SnapshotStore.FilePredicate.EqTo("doc_id", 99999999L))
      assert(pruned.length < m.files.length,
        s"bloom pruning must fire (kept ${pruned.length}/${m.files.length})")
      // SET via the registered name keeps catalog + manifest in lockstep
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('dept'='ml-infra')")
      val m2 = SnapshotStore.manifest(spark, dir,
        SnapshotStore.latestVersion(spark, dir).get)
      assert(m2.properties("dept") == "ml-infra")
      assert(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
        .properties("dept") == "ml-infra")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("case-variant graft.* keys canonicalize AND take operational " +
    "effect: graft.BloomColumns declares blooms, graft.Constraints.* " +
    "validates existing rows — never a recorded-but-inert knob") {
    val dir = freshDir()
    seed(dir)
    // case-variant bloom declaration must flow into the OPERATIONAL
    // bloomCols field, not just the property map
    SnapshotStore.setTableProperties(spark, dir,
      Map("graft.BLOOMCOLUMNS" -> "doc_id"))
    val m2 = SnapshotStore.manifest(spark, dir, 2L)
    assert(m2.properties.contains(SnapshotStore.BloomColumnsKey),
      s"canonical key expected, got ${m2.properties.keys}")
    assert(m2.bloomCols == Seq("doc_id"),
      "the case-variant declaration must reach the operational field")
    SnapshotStore.commitAppend(spark, dir,
      (200L to 260L).map(i => (i, s"x$i", i)).toDF("doc_id", "text", "score"),
      "append")
    val m3 = SnapshotStore.manifest(spark, dir, 3L)
    val freshFiles = m3.files.filterNot(m2.files.toSet)
    assert(freshFiles.nonEmpty &&
      freshFiles.forall(f => m3.stats(f).blooms.contains("doc_id")),
      "new files must collect blooms under the case-variant declaration")
    // case-variant CONSTRAINT key must validate the existing rows —
    // score has values > 3, so this must refuse, not land inert
    intercept[SnapshotStore.ConstraintViolationException](
      SnapshotStore.setTableProperties(spark, dir,
        Map("graft.CONSTRAINTS.low" -> "score <= 3")))
    assert(!SnapshotStore.read(spark, dir).isEmpty)
  }

  test("UNSET matches graft.* keys case-insensitively but NON-graft " +
    "keys exactly — unsetting owner never destroys a distinct Owner") {
    val dir = freshDir()
    seed(dir)
    SnapshotStore.setTableProperties(spark, dir,
      Map("owner" -> "a", "Owner" -> "b", "graft.checkpointInterval" -> "5"))
    SnapshotStore.unsetTableProperties(spark, dir,
      Seq("owner", "GRAFT.CHECKPOINTINTERVAL"))
    val props = SnapshotStore.manifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get).properties
    assert(props == Map("Owner" -> "b"),
      s"exact-case user-key removal + case-insensitive graft removal, " +
        s"got $props")
  }

  test("RENAME and DROP of a column referenced by a CHECK constraint " +
    "refuse (the constraint would wedge every later write); dropping " +
    "the constraint first unblocks the DDL") {
    val dir = freshDir()
    seed(dir)
    SnapshotStore.setTableProperties(spark, dir,
      Map("graft.constraints.pos" -> "score >= 0"))
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      SnapshotStore.renameColumn(spark, dir, "score", "quality"))
    assert(e1.getMessage.contains("CHECK constraint"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      SnapshotStore.dropColumn(spark, dir, "score"))
    assert(e2.getMessage.contains("CHECK constraint"))
    // a column the constraint does NOT reference renames fine
    SnapshotStore.renameColumn(spark, dir, "text", "body")
    // retire the constraint -> the blocked DDLs proceed
    SnapshotStore.unsetTableProperties(spark, dir,
      Seq("graft.constraints.pos"))
    SnapshotStore.renameColumn(spark, dir, "score", "quality")
    assert(SnapshotStore.read(spark, dir).columns.toSeq ==
      Seq("doc_id", "body", "quality"))
    // and appends still validate nothing (constraint retired)
    SnapshotStore.commitAppend(spark, dir,
      Seq((999L, "z", -5L)).toDF("doc_id", "body", "quality"), "append")
    assert(SnapshotStore.read(spark, dir).count() == 101L)
  }

  test("non-graft TBLPROPERTIES declared at CREATE reach the manifest " +
    "(SHOW TBLPROPERTIES round-trips them), and SQL doubled-quote " +
    "escapes land unescaped") {
    val dir = freshDir()
    val tbl = "graft_props_rt"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    (1L to 20L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .createOrReplaceTempView("graft_props_rt_src")
    try {
      spark.sql(
        s"""CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')
           |TBLPROPERTIES ('team'='curation', 'note'='it''s fine',
           |  'graft.bloomColumns'='doc_id')
           |AS SELECT * FROM graft_props_rt_src""".stripMargin)
      val props = SnapshotStore.manifest(spark, dir, 1L).properties
      assert(props.get("team").contains("curation"),
        s"non-graft CREATE property must reach the manifest, got $props")
      assert(props.get("note").contains("it's fine"),
        s"doubled-quote escape must unescape, got ${props.get("note")}")
      val shown = spark.sql(s"SHOW TBLPROPERTIES $tbl")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(shown.get("team").contains("curation") &&
        shown.get("note").contains("it's fine"),
        s"SHOW TBLPROPERTIES must round-trip every declared pair: $shown")
      // escaped quotes through ALTER TABLE SET too, incl. a comma after
      // the escape (one token, not two)
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('memo'='a''b,c')")
      assert(SnapshotStore.manifest(spark, dir, 2L)
        .properties.get("memo").contains("a'b,c"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SET NOT NULL records the not-null invariant as a table CHECK: " +
    "existing nulls refuse the DDL, later null-bearing writes refuse " +
    "wholesale (including evolution-omitted columns), DROP NOT NULL " +
    "retires it") {
    val dir = freshDir()
    val tbl = "graft_notnull_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    SnapshotStore.commit(spark, dir,
      (1L to 20L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN text SET NOT NULL")
      // a null-bearing INSERT refuses WHOLESALE
      intercept[SnapshotStore.ConstraintViolationException](
        spark.sql(s"INSERT INTO $tbl VALUES (100, NULL)"))
      assert(spark.table(tbl).count() == 20L, "nothing committed")
      // an append that OMITS the column null-fills -> genuinely violates
      intercept[SnapshotStore.ConstraintViolationException](
        SnapshotStore.commitAppend(spark, dir,
          Seq(Tuple1(101L)).toDF("doc_id"), "append"))
      // existing-null refusal: a second table with nulls refuses SET
      val dir2 = freshDir()
      SnapshotStore.commit(spark, dir2,
        Seq((1L, "a"), (2L, null)).toDF("doc_id", "text"), "ingest")
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"ALTER TABLE '$dir2' ALTER COLUMN text SET NOT NULL"))
      assert(e.getMessage.contains("cannot SET NOT NULL"))
      // the invariant blocks RENAME of the column until dropped
      intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"ALTER TABLE $tbl RENAME COLUMN text TO body"))
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN text DROP NOT NULL")
      spark.sql(s"INSERT INTO $tbl VALUES (100, NULL)")
      assert(spark.table(tbl).count() == 21L, "retired after DROP NOT NULL")
      // unknown column refuses
      val e2 = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"ALTER TABLE $tbl ALTER COLUMN nope SET NOT NULL"))
      assert(e2.getMessage.contains("does not exist"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
