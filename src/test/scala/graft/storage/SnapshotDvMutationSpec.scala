package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Contract of merge-on-read UPDATE and MERGE (round 17 — deletion
  * vectors extended from DELETE to the full DML triad): a point UPDATE
  * appends O(marks) post-image rows + O(marks) vector bytes instead of
  * rewriting files; an upsert whose keys hit a sliver of each touched
  * file carries + vectors + appends; answers equal the copy-on-write
  * path on every reader face INCLUDING the row-grain CDF; and the SQL
  * verbs auto-dispatch on the measured 5% threshold. */
class SnapshotDvMutationSpec extends SparkSpec {

  import spark.implicits._
  import SnapshotStore.FilePredicate._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapdvmut").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def seed(dir: String, n: Long = 400L): Unit =
    SnapshotStore.commit(spark, dir,
      (1L to n).map(i => (i, s"t$i", i % 7))
        .toDF("doc_id", "text", "score")
        .repartitionByRange(8, col("doc_id")), "ingest")

  test("a 1-row DV UPDATE carries every file, masks exactly one " +
    "pre-image position, and appends exactly one post-image row " +
    "(write amplification O(marks), not O(file))") {
    val dir = freshDir()
    seed(dir)
    val before = SnapshotStore.manifest(spark, dir, 1L)
    SnapshotStore.updateConditionDv(spark, dir, col("doc_id") === 123L,
      Some(EqTo("doc_id", 123L)),
      Seq("text" -> lit("patched"), "score" -> (col("score") + 100)))
    val after = SnapshotStore.manifest(spark, dir, 2L)
    assert(after.operation == "update-dv")
    assert(before.files.forall(after.files.contains),
      "every prior data file must carry")
    val newFiles = after.files.filterNot(before.files.toSet)
    assert(newFiles.nonEmpty, "the post-image rows land in new files")
    assert(newFiles.map(f => after.stats(f).rows).sum == 1L,
      "exactly ONE appended post-image row")
    assert(after.dvs.size == 1 && after.dvs.values.head.rows == 1L,
      "exactly one masked pre-image position")
    val row = SnapshotStore.read(spark, dir)
      .filter(col("doc_id") === 123L)
      .select("text", "score").as[(String, Long)].collect()
    assert(row.toSeq == Seq(("patched", 123L % 7 + 100)))
    assert(SnapshotStore.read(spark, dir).count() == 400L)
  }

  test("DV UPDATE ≡ CoW UPDATE ≡ expected, with pre-image RHS semantics " +
    "(SET a = b-swap evaluates against the pre-update row)") {
    val dvDir = freshDir(); val cowDir = freshDir()
    seed(dvDir); seed(cowDir)
    val cond = col("doc_id").between(50L, 65L)
    val prune = Some(between("doc_id", 50L, 65L): SnapshotStore.FilePredicate)
    // swap-shaped assignments prove the staging discipline on BOTH paths
    val assigns = Seq(
      "score" -> (length(col("text")).cast("bigint")),
      "text" -> concat(lit("s="), col("score").cast("string")))
    SnapshotStore.updateConditionDv(spark, dvDir, cond, prune, assigns)
    SnapshotStore.updateCondition(spark, cowDir, cond, prune, assigns)
    val dv = SnapshotStore.read(spark, dvDir)
      .orderBy("doc_id").collect().toSeq
    val cow = SnapshotStore.read(spark, cowDir)
      .orderBy("doc_id").collect().toSeq
    assert(dv == cow, "merge-on-read and copy-on-write must agree exactly")
    val hit = SnapshotStore.read(spark, dvDir)
      .filter(col("doc_id") === 60L)
      .select("text", "score").as[(String, Long)].collect().head
    assert(hit == (s"s=${60L % 7}", "t60".length.toLong),
      "RHS must see the PRE-update row on the DV path")
  }

  test("a NON-DETERMINISTIC update condition cannot lose or duplicate " +
    "rows on the DV path: the marked pre-image set is persisted, so the " +
    "vector masks exactly the rows whose post-images append") {
    val dir = freshDir()
    seed(dir, 400L)
    // rand() evaluates differently per plan run — without the persist,
    // the vector write and the post-image write would mark DIFFERENT
    // row sets, duplicating or losing keys
    SnapshotStore.updateConditionDv(spark, dir,
      rand() < 0.3, None, Seq("text" -> lit("touched")))
    val after = SnapshotStore.read(spark, dir)
    assert(after.count() == 400L, "row count must be preserved")
    assert(after.select("doc_id").distinct().count() == 400L,
      "every key exactly once — no mask/post-image divergence")
    // masked positions == appended post-images, by the manifest's own
    // accounting
    val m = SnapshotStore.manifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get)
    val before = SnapshotStore.manifest(spark, dir, 1L).files.toSet
    val appended = m.files.filterNot(before)
      .map(f => m.stats(f).rows).sum
    assert(m.dvs.values.map(_.rows).sum == appended,
      "vector marks and post-image rows must account identically")
  }

  test("the row-grain CDF reports identical update_preimage/postimage " +
    "pairs from the DV and CoW update paths") {
    val dvDir = freshDir(); val cowDir = freshDir()
    seed(dvDir, 100L); seed(cowDir, 100L)
    val cond = col("doc_id").isin(7L, 42L)
    val prune = Some(InSet("doc_id", Seq(7L, 42L)): SnapshotStore.FilePredicate)
    val assigns = Seq("text" -> lit("v2"))
    SnapshotStore.updateConditionDv(spark, dvDir, cond, prune, assigns)
    SnapshotStore.updateCondition(spark, cowDir, cond, prune, assigns)
    def cdf(dir: String) = SnapshotStore
      .readRowChanges(spark, dir, 1L, 2L, Seq("doc_id"))
      .orderBy("doc_id", "_change_type").collect().toSeq
    val a = cdf(dvDir); val b = cdf(cowDir)
    assert(a == b, "CDF parity across mutation strategies")
    assert(a.count(_.getString(3) == "update_preimage") == 2)
    assert(a.count(_.getString(3) == "update_postimage") == 2)
  }

  test("DV UPDATE of a PARTITION column appends post-images under their " +
    "NEW col=value dirs; reads route them correctly") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 60L).map(i => (i, s"t$i", if (i <= 30) "a" else "b"))
        .toDF("doc_id", "text", "grp"),
      "ingest", partitionBy = Seq("grp"))
    SnapshotStore.updateConditionDv(spark, dir, col("doc_id") === 5L,
      Some(EqTo("doc_id", 5L)), Seq("grp" -> lit("b")))
    val got = SnapshotStore.read(spark, dir)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 29L, "b" -> 31L))
    // and the moved row's file lives under grp=b physically
    val m = SnapshotStore.manifest(spark, dir,
      SnapshotStore.latestVersion(spark, dir).get)
    val moved = m.files.filterNot(
      SnapshotStore.manifest(spark, dir, 1L).files.toSet)
    assert(moved.nonEmpty && moved.forall(_.contains("grp=b")))
  }

  test("mergeDv ≡ merge ≡ expected: replaced keys vector their " +
    "pre-images, the delta appends whole, new keys insert; chained " +
    "upserts fold; purge retires the vectors") {
    val dvDir = freshDir(); val cowDir = freshDir()
    seed(dvDir); seed(cowDir)
    def delta1 = (10L to 15L).map(i => (i, s"u$i", i % 7))
      .toDF("doc_id", "text", "score")
      .unionAll(Seq((9000L, "new", 0L)).toDF("doc_id", "text", "score"))
    def delta2 = (12L to 18L).map(i => (i, s"w$i", i % 7))
      .toDF("doc_id", "text", "score")
    SnapshotStore.mergeDv(spark, dvDir, delta1, Seq("doc_id"))
    SnapshotStore.mergeDv(spark, dvDir, delta2, Seq("doc_id"))
    SnapshotStore.merge(spark, cowDir, delta1, Seq("doc_id"))
    SnapshotStore.merge(spark, cowDir, delta2, Seq("doc_id"))
    def state(dir: String) = SnapshotStore.read(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(state(dvDir) == state(cowDir))
    assert(SnapshotStore.read(spark, dvDir).count() == 401L)
    // chained DV merges folded: every vectored file references ONE path
    val m = SnapshotStore.manifest(spark, dvDir,
      SnapshotStore.latestVersion(spark, dvDir).get)
    assert(m.dvs.nonEmpty)
    // duplicate-key visibility: doc_id 12..15 were replaced TWICE — the
    // unique-key invariant must hold (one live row per key)
    val dup = SnapshotStore.read(spark, dvDir)
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dup == 0L, "chained DV upserts must never duplicate a key")
    // purge materializes; answers unchanged
    SnapshotStore.purgeVectors(spark, dvDir)
    val mp = SnapshotStore.manifest(spark, dvDir,
      SnapshotStore.latestVersion(spark, dvDir).get)
    assert(mp.dvs.isEmpty)
    assert(state(dvDir) == state(cowDir))
  }

  test("SQL UPDATE and MERGE auto-dispatch on the measured 5% threshold: " +
    "narrow mutations take the DV path, wide ones copy-on-write") {
    val dir = freshDir()
    seed(dir, 1000L)
    val tbl = "graft_dvmut_auto"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      // 3 of the touched file's ~125 live rows (≈2.4%) → DV
      spark.sql(s"UPDATE $tbl SET text = 'x' WHERE doc_id <= 3")
      assert(SnapshotStore.manifest(spark, dir, 2L).operation == "update-dv")
      // ~90% of rows → CoW
      spark.sql(s"UPDATE $tbl SET text = 'y' WHERE doc_id <= 900")
      assert(SnapshotStore.manifest(spark, dir, 3L).operation == "update")
      assert(SnapshotStore.manifest(spark, dir, 3L).dvs.isEmpty,
        "the CoW rewrite materializes prior vectors away")
      // narrow MERGE → merge-dv
      (1L to 5L).map(i => (i, "m", i)).toDF("doc_id", "text", "score")
        .createOrReplaceTempView("graft_dvmut_d1")
      spark.sql(
        s"""MERGE INTO $tbl t USING graft_dvmut_d1 s ON t.doc_id = s.doc_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(SnapshotStore.manifest(spark, dir, 4L).operation == "merge-dv")
      // wide MERGE → merge (CoW)
      (1L to 800L).map(i => (i, "M", i)).toDF("doc_id", "text", "score")
        .createOrReplaceTempView("graft_dvmut_d2")
      spark.sql(
        s"""MERGE INTO $tbl t USING graft_dvmut_d2 s ON t.doc_id = s.doc_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(SnapshotStore.manifest(spark, dir, 5L).operation == "merge")
      // the end state is exactly the relational fold of the four verbs
      val expect = (1L to 1000L).map { i =>
        val t1 = if (i <= 3) "x" else s"t$i"
        val t2 = if (i <= 900) "y" else t1
        val t3 = if (i <= 5) "m" else t2
        val t4 = if (i <= 800) "M" else t3
        val sc = if (i <= 5) i else if (i <= 800) i else i % 7
        (i, t4, if (i <= 800) i else sc)
      }
      val got = SnapshotStore.read(spark, dir)
        .select("doc_id", "text", "score")
        .as[(Long, String, Long)].orderBy("doc_id").collect().toSeq
      assert(got == expect)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("the DV write is per-file-parallel (round 18): marks for N files " +
    "land in multiple bucket files, each file's DvRef points at its OWN " +
    "bucket, a one-file read loads only that bucket, and vacuum keeps " +
    "every referenced bucket") {
    val dir = freshDir()
    // 8 files, every one marked by the delete
    SnapshotStore.commit(spark, dir,
      (1L to 800L).map(i => (i, i % 8)).toDF("id", "grp").repartition(8),
      "ingest")
    SnapshotStore.deleteWhereDv(spark, dir,
      SnapshotStore.FilePredicate.LtEq("id", 2L))
    // ... then a second DV delete folds over the first
    SnapshotStore.deleteWhereDv(spark, dir,
      SnapshotStore.FilePredicate.GtEq("id", 799L))
    val m = SnapshotStore.manifest(spark, dir, 3L)
    val refs = m.dvs
    assert(refs.nonEmpty, "vectored files must carry refs")
    val bucketPaths = refs.values.map(_.path).toSet
    assert(bucketPaths.size >= 2,
      s"marks for ${refs.size} files must land in multiple buckets, " +
        s"got ${bucketPaths.size} distinct vector paths")
    bucketPaths.foreach(p => assert(p.contains("/__b="),
      s"a DvRef must point at its own bucket, got $p"))
    // every bucket path resolves and holds only (file, pos) rows of
    // files that hash there — the per-file read is bucket-local
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    bucketPaths.foreach(p => assert(
      fs.exists(new org.apache.hadoop.fs.Path(p)), s"missing bucket $p"))
    refs.foreach { case (f, ref) =>
      val entries = spark.read.schema(SnapshotStore.DvSchema)
        .parquet(ref.path)
      val mine = entries.filter(col("file").contains(
        new org.apache.hadoop.fs.Path(f).getName)).count()
      assert(mine == ref.rows,
        s"bucket ${ref.path} must hold exactly $f's ${ref.rows} marks")
    }
    // correctness: both deletes applied, idempotent under vacuum
    assert(SnapshotStore.read(spark, dir).count() == 800L - 2L - 2L)
    SnapshotStore.vacuum(spark, dir, retain = 1)
    assert(SnapshotStore.read(spark, dir).count() == 796L,
      "vacuum must keep every referenced DV bucket")
  }
}
