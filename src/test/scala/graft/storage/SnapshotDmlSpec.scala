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
      // round 17: a 1-matched-key upsert auto-dispatches to merge-on-read
      // (SnapshotDvMutationSpec pins both sides of the threshold)
      assert(SnapshotStore.manifest(spark, dir,
        SnapshotStore.latestVersion(spark, dir).get).operation == "merge-dv")
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
      // refusals from the resolution rule are ANALYSIS errors — the
      // exception type matches every native Spark refusal around them
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          """MERGE INTO dml_mrg3 t USING dml_src3 s ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage.contains("graft-snapshot MERGE INTO supports"))
      assert(SnapshotStore.latestVersion(spark, dir).contains(1L),
        "a refused merge must not commit")
    }
  }

  test("UPDATE rewrites only might-match files; RHS sees the PRE-update row") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 400L).map(i => (i, i * 10L, i * 100L)).toDF("doc_id", "a", "b")
        .repartitionByRange(8, col("doc_id")), "ingest")
    val before = SnapshotStore.manifest(spark, dir, 1L)
    withTable("dml_upd", dir) {
      // a swap: both RHS must evaluate against the old row
      spark.sql("UPDATE dml_upd SET a = b, b = a WHERE doc_id BETWEEN 90 AND 110")
      val after = SnapshotStore.manifest(spark, dir, 2L)
      assert(after.operation == "update")
      val carried = after.files.toSet.intersect(before.files.toSet)
      assert(carried.size >= 6,
        s"a narrow SQL UPDATE must carry most files: ${carried.size} of 8")
      val got = SnapshotStore.read(spark, dir)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(100L) == ((100L * 100L, 100L * 10L)), "swap semantics")
      assert(got(89L) == ((89L * 10L, 89L * 100L)), "off-range rows untouched")
      // unconditional update (no WHERE): every row rewrites
      spark.sql("UPDATE dml_upd SET a = a + 1")
      assert(SnapshotStore.read(spark, dir)
        .agg(sum(col("a"))).as[Long].head() ==
        got.values.map(_._1).sum + 400L)
    }
  }

  test("UPDATE condition referencing an ASSIGNED column evaluates once against the pre-update row") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, 20L, 7L), (2L, 11L, 7L), (3L, 5L, 7L))
        .toDF("doc_id", "a", "b"), "ingest")
    withTable("dml_updc", dir) {
      // SQL UPDATE semantics: the WHERE sees the PRE-update `a`, so BOTH
      // assignments apply to rows 1 and 2 (a>10 pre-image) and row 3 is
      // untouched — a condition re-evaluated after the `a` swap would
      // silently skip `b = 0` whenever `a - 1` fell to <= 10, and could
      // spuriously assign rows the pre-image excluded
      spark.sql("UPDATE dml_updc SET a = a - 1, b = 0 WHERE a > 10")
      assert(SnapshotStore.read(spark, dir)
        .as[(Long, Long, Long)].collect().toSet ==
        Set((1L, 19L, 0L), (2L, 10L, 0L), (3L, 5L, 7L)))
    }
  }

  test("UPDATE keeps null-condition rows untouched and refuses unknown columns") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, Option("aa")), (2L, Option.empty[String]))
        .toDF("doc_id", "tag"), "ingest")
    withTable("dml_upd2", dir) {
      spark.sql("UPDATE dml_upd2 SET tag = 'hit' WHERE length(tag) = 2")
      assert(SnapshotStore.read(spark, dir)
        .as[(Long, Option[String])].collect().toSet ==
        Set((1L, Some("hit")), (2L, None)),
        "a null condition leaves the row untouched (SQL semantics)")
      // unknown column refuses at analysis (Spark's resolution refuses
      // before our rule ever sees it)
      intercept[Exception] {
        spark.sql("UPDATE dml_upd2 SET nosuch = 1")
      }
      assert(SnapshotStore.latestVersion(spark, dir).contains(2L))
    }
  }

  test("TIMESTAMP AS OF: versionAtTimestamp resolves commit instants; source option reads it") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    Thread.sleep(5)
    SnapshotStore.commitAppend(spark, dir, Seq((2L, "b")).toDF("doc_id", "text"), "append")
    Thread.sleep(5)
    SnapshotStore.commitAppend(spark, dir, Seq((3L, "c")).toDF("doc_id", "text"), "append")
    val ts = (1L to 3L).map(v => SnapshotStore.manifest(spark, dir, v).ts)
    assert(ts.forall(_ > 0L) && ts.sorted == ts)
    assert(SnapshotStore.versionAtTimestamp(spark, dir, ts(0)) == 1L)
    assert(SnapshotStore.versionAtTimestamp(spark, dir, ts(1)) == 2L)
    assert(SnapshotStore.versionAtTimestamp(spark, dir, (ts(1) + ts(2)) / 2)
      == 2L, "an instant between commits resolves to the earlier version")
    assert(SnapshotStore.versionAtTimestamp(spark, dir, ts(2) + 60000L) == 3L)
    intercept[RuntimeException] {
      SnapshotStore.versionAtTimestamp(spark, dir, ts(0) - 60000L)
    }
    assert(SnapshotStore.readAsOfTimestamp(spark, dir, ts(1)).count() == 2L)
    // the registered source speaks it too
    assert(spark.read.format("graft-snapshot")
      .option("timestampAsOf", ts(1)).load(dir).count() == 2L)
    intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("version", 1).option("timestampAsOf", ts(1)).load(dir).count()
    }
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF resolve through the parser hook") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    Thread.sleep(5)
    SnapshotStore.commit(spark, dir,
      Seq((2L, "b"), (3L, "c")).toDF("doc_id", "text"), "replace")
    withTable("tt_snap", dir) {
      assert(spark.sql("SELECT count(*) FROM tt_snap").as[Long].head() == 2L)
      assert(spark.sql("SELECT doc_id FROM tt_snap VERSION AS OF 1")
        .as[Long].collect().toSeq == Seq(1L))
      assert(spark.sql("SELECT count(*) FROM tt_snap VERSION AS OF 2")
        .as[Long].head() == 2L)
      // TIMESTAMP AS OF via the store's own recorded instants: a string
      // timestamp and an epoch-millis integral both resolve
      val ts1 = SnapshotStore.manifest(spark, dir, 1L).ts
      assert(spark.sql(s"SELECT doc_id FROM tt_snap TIMESTAMP AS OF $ts1")
        .as[Long].collect().toSeq == Seq(1L))
      val s1 = java.time.Instant.ofEpochMilli(ts1)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString.replace('T', ' ')
      assert(spark.sql(
        s"SELECT doc_id FROM tt_snap TIMESTAMP AS OF '$s1'")
        .as[Long].collect().toSeq == Seq(1L),
        "a string timestamp casts through the session zone (UTC here)")
      // joins and filters compose over the travelled relation
      assert(spark.sql(
        """SELECT a.doc_id FROM tt_snap a
          |JOIN (SELECT doc_id FROM tt_snap VERSION AS OF 1) b
          |ON a.doc_id = b.doc_id""".stripMargin).count() == 0L,
        "v1's row was replaced in v2 — the join across versions is empty")
      // a vacuumed-away version refuses
      intercept[Exception] {
        spark.sql("SELECT * FROM tt_snap VERSION AS OF 99").collect()
      }
    }
    // non-snapshot tables keep Spark's own refusal
    Seq((1L, "x")).toDF("doc_id", "text").write.mode("overwrite")
      .saveAsTable("tt_plain")
    try {
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM tt_plain VERSION AS OF 1").collect()
      }
      assert(e.getMessage.toLowerCase.contains("time travel"))
    } finally spark.sql("DROP TABLE IF EXISTS tt_plain")
  }

  test("a mixed AND condition still file-skips on its translatable conjuncts") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 400L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartitionByRange(8, col("doc_id")), "ingest")
    val before = SnapshotStore.manifest(spark, dir, 1L)
    withTable("dml_mix", dir) {
      // length(text) has no stats form; the doc_id range alone must
      // still carry the off-range files (fromCatalyst's AND translates
      // any subset of conjuncts)
      spark.sql("DELETE FROM dml_mix WHERE doc_id BETWEEN 90 AND 110 " +
        "AND length(text) >= 3")
      val after = SnapshotStore.manifest(spark, dir, 2L)
      val carried = after.files.toSet.intersect(before.files.toSet)
      assert(carried.size >= 6,
        s"translatable conjuncts must keep pruning: ${carried.size} of 8")
      assert(SnapshotStore.read(spark, dir).count() == 400L - 21L)
    }
  }

  test("a temp view SHADOWING a snapshot table keeps Spark's own time-travel refusal") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, Seq((1L, "a")).toDF("doc_id", "text"), "ingest")
    withTable("tt_shadow", dir) {
      // shadow the catalog name with a DIFFERENT relation
      Seq((99L, "view")).toDF("doc_id", "text")
        .createOrReplaceTempView("tt_shadow")
      try {
        assert(spark.sql("SELECT doc_id FROM tt_shadow")
          .as[Long].head() == 99L, "plain reads resolve the view")
        val e = intercept[Exception] {
          spark.sql("SELECT * FROM tt_shadow VERSION AS OF 1").collect()
        }
        assert(e.getMessage.toLowerCase.contains("time travel"),
          "the parser hook must NOT resolve past the shadowing view " +
            "to the catalog table")
      } finally spark.catalog.dropTempView("tt_shadow")
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

  test("INSERT INTO appends through the manifest commit; prior files carry untouched") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "ingest")
    val before = SnapshotStore.manifest(spark, dir, 1L)
    withTable("dml_ins", dir) {
      spark.sql("INSERT INTO dml_ins VALUES (3, 'c'), (4, 'd')")
      val after = SnapshotStore.manifest(spark, dir, 2L)
      assert(after.operation == "insert")
      assert(before.files.toSet.subsetOf(after.files.toSet),
        "an append commit carries every prior file")
      assert(SnapshotStore.read(spark, dir)
        .as[(Long, String)].collect().toMap ==
        Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
      // INSERT INTO ... SELECT over another relation
      spark.sql("INSERT INTO dml_ins SELECT doc_id + 10, text FROM dml_ins " +
        "WHERE doc_id <= 2")
      assert(SnapshotStore.read(spark, dir).count() == 6L)
      // the inserted commit records stats: a point read file-skips
      import SnapshotStore.FilePredicate._
      assert(SnapshotStore.readAsOfWhere(spark, dir, 3L,
        EqTo("doc_id", 11L)).count() == 1L)
    }
  }

  test("INSERT OVERWRITE is a full-snapshot commit; history stays readable") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "ingest")
    withTable("dml_insov", dir) {
      spark.sql("INSERT OVERWRITE dml_insov VALUES (9, 'z')")
      assert(SnapshotStore.manifest(spark, dir, 2L).operation ==
        "insert-overwrite")
      assert(SnapshotStore.read(spark, dir)
        .as[(Long, String)].collect().toSet == Set((9L, "z")))
      assert(SnapshotStore.readAsOf(spark, dir, 1L).count() == 2L,
        "pre-overwrite versions time-travel intact")
    }
  }

  test("INSERT with a column list null-fills unnamed columns; BY NAME maps by name; arity and unknown columns refuse as AnalysisException") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a", 10L)).toDF("doc_id", "text", "score"), "ingest")
    withTable("dml_insc", dir) {
      spark.sql("INSERT INTO dml_insc (doc_id, text) VALUES (2, 'b')")
      assert(SnapshotStore.read(spark, dir)
        .as[(Long, String, Option[Long])].collect().toSet ==
        Set((1L, "a", Some(10L)), (2L, "b", None)),
        "unnamed columns null-fill")
      spark.sql("INSERT INTO dml_insc BY NAME " +
        "SELECT 'c' AS text, 30L AS score, 3L AS doc_id")
      assert(SnapshotStore.read(spark, dir)
        .filter(col("doc_id") === 3L)
        .as[(Long, String, Option[Long])].head() == ((3L, "c", Some(30L))))
      val e1 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("INSERT INTO dml_insc VALUES (4, 'd')")
      }
      assert(e1.getMessage.contains("positionally"))
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("INSERT INTO dml_insc (doc_id, nosuch) VALUES (4, 'd')")
      }
      assert(e2.getMessage.contains("unknown column") ||
        e2.getMessage.toLowerCase.contains("cannot resolve"))
      assert(SnapshotStore.latestVersion(spark, dir).contains(3L),
        "refused inserts must not commit")
    }
  }

  test("INSERT INTO a partitioned table inherits the hive layout; PARTITION clause refuses") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "en", "a"), (2L, "de", "b")).toDF("doc_id", "lang", "text"),
      "ingest", partitionBy = Seq("lang"))
    withTable("dml_insp", dir) {
      // NOTE: the SQL face surfaces partition columns LAST, so the
      // positional order here is (doc_id, text, lang)
      spark.sql("INSERT INTO dml_insp VALUES (3, 'c', 'fr')")
      val m = SnapshotStore.manifest(spark, dir, 2L)
      assert(m.partitionCols == Seq("lang"))
      val newFiles = m.files.filterNot(
        SnapshotStore.manifest(spark, dir, 1L).files.toSet)
      assert(newFiles.nonEmpty && newFiles.forall(_.contains("lang=fr")),
        s"inserted rows must land under their hive partition dirs: $newFiles")
      assert(SnapshotStore.read(spark, dir)
        .filter(col("lang") === "fr").count() == 1L)
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("INSERT INTO dml_insp PARTITION (lang='en') " +
          "VALUES (4, 'd')")
      }
      assert(e.getMessage.contains("PARTITION clause"))
    }
  }

  test("OPTIMIZE compacts; OPTIMIZE ZORDER BY clusters; results keep reading exactly") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 400L).map(i => (i, i % 97L, s"t$i")).toDF("doc_id", "k", "text")
        .repartition(16), "ingest")
    withTable("dml_opt", dir) {
      val r1 = spark.sql("OPTIMIZE dml_opt").collect()
      assert(r1.map(_.getString(1)).toSeq == Seq("compact"))
      val m2 = SnapshotStore.manifest(spark, dir, 2L)
      assert(m2.operation == "compact")
      assert(m2.files.length < 16, s"compaction must shrink the file count")
      val r2 = spark.sql("OPTIMIZE dml_opt ZORDER BY (doc_id, k)").collect()
      assert(r2.map(_.getString(1)).toSeq == Seq("zorder"))
      assert(SnapshotStore.manifest(spark, dir, 3L).operation == "zorder")
      assert(SnapshotStore.read(spark, dir).count() == 400L)
      // the clustered layout's stats prune through the index
      val (df, idx) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, 3L)
      df.filter(col("doc_id").between(10L, 20L)).count()
      assert(idx.lastListedCount >= 0)
    }
  }

  test("VACUUM RETAIN n VERSIONS and DESCRIBE HISTORY speak SQL") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, Seq((1L, "a")).toDF("doc_id", "text"),
      "ingest")
    SnapshotStore.commitAppend(spark, dir,
      Seq((2L, "b")).toDF("doc_id", "text"), "append")
    SnapshotStore.commitAppend(spark, dir,
      Seq((3L, "c")).toDF("doc_id", "text"), "append")
    withTable("dml_vac", dir) {
      val hist = spark.sql("DESCRIBE HISTORY dml_vac").collect()
      assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "ingest"), (2L, "append"), (3L, "append")))
      assert(hist.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L),
        "exact manifest row counts, no data scan")
      // the catalog may qualify the stored path with a scheme
      assert(spark.sql("VACUUM dml_vac RETAIN 2 VERSIONS")
        .collect().map(_.getString(0)).toSeq.map(_.stripPrefix("file://"))
        == Seq(dir))
      assert(SnapshotStore.versions(spark, dir) == Seq(2L, 3L))
      assert(spark.sql("DESC HISTORY dml_vac").collect().length == 2)
      assert(SnapshotStore.read(spark, dir).count() == 3L,
        "the retained latest keeps reading after vacuum")
    }
  }

  test("VACUUM ... DRY RUN previews the blast radius, mutates NOTHING, " +
    "and the real vacuum then removes exactly the previewed paths") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartition(2), "ingest")
    SnapshotStore.commitAppend(spark, dir,
      Seq((51L, "x")).toDF("doc_id", "text"), "append")
    SnapshotStore.compact(spark, dir) // v1+v2 dirs become unreferenced
    withTable("dml_dry", dir) {
      val before = SnapshotStore.versions(spark, dir)
      val preview = spark.sql("VACUUM dml_dry RETAIN 1 VERSIONS DRY RUN")
        .collect().map(_.getString(0)).toSeq
      assert(preview.exists(_.contains("v00000001")) &&
        preview.exists(_.contains("v00000002")),
        s"the preview must name the doomed versions: $preview")
      // NOTHING mutated: versions intact, every previewed path present
      assert(SnapshotStore.versions(spark, dir) == before)
      val f = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(preview.forall(p =>
        f.exists(new org.apache.hadoop.fs.Path(p))),
        "a DRY RUN must leave every previewed path in place")
      // the real vacuum removes exactly the previewed paths
      spark.sql("VACUUM dml_dry RETAIN 1 VERSIONS")
      assert(preview.forall(p =>
        !f.exists(new org.apache.hadoop.fs.Path(p))),
        "the real vacuum removes what the preview named")
      assert(SnapshotStore.read(spark, dir).count() == 51L)
      // a post-vacuum preview has nothing left to name; HOURS form parses
      assert(spark.sql("VACUUM dml_dry RETAIN 1 VERSIONS DRY RUN")
        .collect().isEmpty)
      assert(spark.sql("VACUUM dml_dry RETAIN 99999 HOURS DRY RUN")
        .collect().isEmpty)
    }
  }

  test("SQL reads see SQL mutations immediately: the relation cache invalidates after DML and maintenance verbs") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartition(4), "ingest")
    withTable("dml_cache", dir) {
      // prime Spark's per-name relation cache (FindDataSourceTable)
      assert(spark.sql("SELECT count(*) AS n FROM dml_cache")
        .as[Long].head() == 100L)
      spark.sql("INSERT INTO dml_cache VALUES (101, 'new')")
      assert(spark.sql("SELECT count(*) AS n FROM dml_cache")
        .as[Long].head() == 101L,
        "a cached pre-INSERT relation must not serve after the INSERT")
      spark.sql("DELETE FROM dml_cache WHERE doc_id = 5")
      assert(spark.sql("SELECT count(*) AS n FROM dml_cache")
        .as[Long].head() == 100L,
        "a cached relation must not resurrect a deleted row")
      // the nastiest case: a cached relation listing files VACUUM
      // reclaimed would throw FileNotFoundException
      spark.sql("OPTIMIZE dml_cache")
      spark.sql("VACUUM dml_cache RETAIN 1 VERSIONS")
      assert(spark.sql("SELECT count(*) AS n FROM dml_cache")
        .as[Long].head() == 100L,
        "post-vacuum SQL reads must re-resolve, not list reclaimed files")
    }
  }

  test("INSERT with a DUPLICATE column list refuses (a silent first-wins mapping would drop data)") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a", 1L)).toDF("doc_id", "text", "score"), "ingest")
    withTable("dml_insd", dir) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("INSERT INTO dml_insd (doc_id, doc_id) VALUES (2, 3)")
      }
      assert(e.getMessage.contains("more than once"))
      assert(SnapshotStore.latestVersion(spark, dir).contains(1L))
    }
  }

  test("INSERT OVERWRITE carries the bloom declaration like the partition layout") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest",
      bloomCols = Seq("doc_id"))
    withTable("dml_insb", dir) {
      spark.sql("INSERT OVERWRITE dml_insb SELECT doc_id + 100, text " +
        "FROM dml_insb")
      val m = SnapshotStore.manifest(spark, dir, 2L)
      assert(m.bloomCols == Seq("doc_id"),
        "OVERWRITE must not silently clear the declared bloom columns")
      assert(m.stats.values.forall(_.blooms.contains("doc_id")))
    }
  }

  test("DESCRIBE over an ordinary table literally named 'history' falls through to Spark's grammar; a typo'd DESCRIBE HISTORY still refuses loudly") {
    Seq((1L, "x")).toDF("doc_id", "text").createOrReplaceTempView("history")
    try {
      // `DESCRIBE history doc_id` is Spark's describe-one-column syntax;
      // our DESCRIBE HISTORY pattern must not hijack it
      val rows = spark.sql("DESCRIBE history doc_id").collect()
      assert(rows.nonEmpty)
    } finally spark.catalog.dropTempView("history")
    // with NO relation named `history` in the session, an unknown
    // identifier keeps the loud snapshot refusal (not "table `history`
    // not found")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DESCRIBE HISTORY no_such_snapshot_tbl")
    }
    assert(e.getMessage.contains("not a registered graft-snapshot table"))
  }

  test("maintenance verbs on a quoted path work; a non-snapshot identifier refuses as AnalysisException") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest")
    val hist = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
    assert(hist.length == 1 && hist.head.getString(1) == "ingest")
    spark.sql(s"OPTIMIZE '$dir'")
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L))
    Seq((1L, "x")).toDF("doc_id", "text").createOrReplaceTempView("plain_m")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("OPTIMIZE plain_m")
    }
    assert(e.getMessage.contains("not a registered graft-snapshot table"))
  }

  test("DESCRIBE HISTORY LIMIT n returns exactly the newest n rows") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 20L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "ingest")
    (1 to 6).foreach(i => SnapshotStore.commitAppend(spark, dir,
      Seq((100L + i, "x")).toDF("doc_id", "text"), s"append-$i"))
    val all = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
    val lim = spark.sql(s"DESCRIBE HISTORY '$dir' LIMIT 3").collect()
    assert(all.length == 7)
    assert(lim.toSeq == all.takeRight(3).toSeq,
      "LIMIT must surface the newest n versions, values identical")
    // bad counts refuse as AnalysisException — zero AND overflow
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"DESCRIBE HISTORY '$dir' LIMIT 0")
    }
    assert(e.getMessage.contains("positive 32-bit count"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"DESCRIBE HISTORY '$dir' LIMIT 99999999999")
    }
    assert(e2.getMessage.contains("positive 32-bit count"))
  }

  test("refusals surface as AnalysisException, never bare RuntimeException: " +
    "OPTIMIZE ZORDER on an empty target, time travel with no operand") {
    val dir = freshDir()
    // no committed version at all
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"OPTIMIZE '$dir' ZORDER BY (doc_id)")
    }
    assert(e1.getMessage.contains("OPTIMIZE ZORDER needs a committed version"))
  }
}
