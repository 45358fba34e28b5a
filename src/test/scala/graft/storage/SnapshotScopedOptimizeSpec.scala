package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of SCOPED compaction (round 18 — Delta's `OPTIMIZE ...
  * WHERE`): only the stats-matching files rewrite (the cold tail's
  * paths carry untouched), content is identical, the commit is a
  * change-feed-excluded rewrite, hot files' deletion vectors
  * materialize away, a no-match predicate is a no-op, and the SQL
  * face refuses untranslatable conditions loudly. */
class SnapshotScopedOptimizeSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapscopt").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("compactWhere rewrites ONLY the stats-matching files: the cold " +
    "tail carries by path, content is identical, DVs on hot files " +
    "retire, and the change feed excludes the rewrite") {
    val dir = freshDir()
    val store = SnapshotStore
    // cold tail: ids 1..1000 in 2 files; hot head: ids 2001..2040 in 8
    // tiny files (the streaming-ingest shape scoped OPTIMIZE exists for)
    store.commit(spark, dir,
      (1 to 1000).map(i => (i.toLong, s"c$i")).toDF("id", "txt")
        .repartitionByRange(2, col("id")), "ingest")
    store.commitAppend(spark, dir,
      (2001 to 2040).map(i => (i.toLong, s"h$i")).toDF("id", "txt")
        .repartitionByRange(8, col("id")), "append")
    // a DV delete inside the hot range — the scoped rewrite must
    // materialize it away
    store.deleteWhereDv(spark, dir,
      SnapshotStore.FilePredicate.EqTo("id", 2003L))
    val before = store.manifest(spark, dir, 3L)
    val coldFiles = before.files.filter(_.contains("v00000001"))
    assert(coldFiles.size == 2 && before.files.size == 10)
    assert(before.dvs.nonEmpty, "the DV delete left vectors")
    val v = store.compactWhere(spark, dir,
      SnapshotStore.FilePredicate.GtEq("id", 2001L),
      targetFileBytes = 128L * 1024 * 1024)
    val after = store.manifest(spark, dir, v)
    assert(after.operation == "compact")
    assert(coldFiles.forall(after.files.contains),
      "cold files must CARRY by path — never rewritten")
    assert(after.files.size == 3,
      s"8 hot files compact to 1 (+2 cold), got ${after.files.size}")
    assert(after.dvs.isEmpty,
      "the hot files' vectors materialize away in the rewrite")
    // content identical to the pre-compaction state
    val got = store.read(spark, dir).orderBy("id")
      .as[(Long, String)].collect().toSeq
    val want = ((1 to 1000).map(i => (i.toLong, s"c$i")) ++
      (2001 to 2040).filter(_ != 2003).map(i => (i.toLong, s"h$i"))).toSeq
    assert(got == want)
    // rewrite commits never surface in the file-grain change feed
    assert(store.readChangesSince(spark, dir, 3L, v).count() == 0L)
    // a predicate matching nothing is a NO-OP, not an empty commit
    assert(store.compactWhere(spark, dir,
      SnapshotStore.FilePredicate.GtEq("id", 99999L)) == v)
    assert(store.latestVersion(spark, dir).contains(v))
  }

  test("SQL face: OPTIMIZE ... WHERE compacts the scoped range on a " +
    "quoted path; unknown columns and untranslatable conditions refuse") {
    val dir = freshDir()
    val store = SnapshotStore
    store.commit(spark, dir,
      (1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "grp")
        .repartitionByRange(2, col("id")), "ingest")
    store.commitAppend(spark, dir,
      (201 to 240).map(i => (i.toLong, i % 5)).toDF("id", "grp")
        .repartitionByRange(6, col("id")), "append")
    val out = spark.sql(s"OPTIMIZE '$dir' WHERE id >= 201").collect()
    assert(out.length == 1 && out(0).getString(1) == "compact")
    val m = store.manifest(spark, dir, out(0).getLong(0))
    assert(m.files.count(_.contains("v00000001")) == 2,
      "cold files carried")
    assert(m.files.size == 3, s"hot range compacted, got ${m.files.size}")
    assert(store.read(spark, dir).count() == 140L)
    val e1 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"OPTIMIZE '$dir' WHERE nope > 1"))
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"OPTIMIZE '$dir' WHERE id + grp > 10"))
    assert(e2.getMessage.contains("does not translate"))
  }

  test("clusterWhere (round 19): the hot range re-clusters with z-order " +
    "locality, the cold tail carries by path, content is identical, the " +
    "rewrite stays out of the change feed, and no-match is a no-op") {
    val dir = freshDir()
    val store = SnapshotStore
    // cold: ids 1..1000 pre-clustered in 2 files; hot: 4 appended files
    // whose (x, y) values interleave badly (round-robin — every file
    // spans the whole range, so per-file min/max prune nothing)
    store.commit(spark, dir,
      (1 to 1000).map(i => (i.toLong, i.toLong % 50, s"c$i"))
        .toDF("x", "y", "txt").repartitionByRange(2, col("x")), "ingest")
    store.commitAppend(spark, dir,
      (2001 to 2800).map(i => (i.toLong, i.toLong % 50, s"h$i"))
        .toDF("x", "y", "txt").repartition(4), "append")
    val before = store.manifest(spark, dir, 2L)
    val coldFiles = before.files.filter(_.contains("v00000001"))
    assert(coldFiles.size == 2 && before.files.size == 6)
    // pre-clustering: a narrow x-slice of the hot range keeps ~all 4
    // hot files (round-robin layout has no locality)
    val hotSliceBefore = store.prunedFiles(spark, dir, 2L,
      SnapshotStore.FilePredicate.between("x", 2001L, 2100L))
      .count(_.contains("v00000002"))
    assert(hotSliceBefore == 4, s"round-robin spans all files, got $hotSliceBefore")
    val v = store.clusterWhere(spark, dir,
      SnapshotStore.FilePredicate.GtEq("x", 2001L), Seq("x", "y"),
      targetFileBytes = 4L * 1024)
    val after = store.manifest(spark, dir, v)
    assert(after.operation == "zorder")
    assert(coldFiles.forall(after.files.contains),
      "cold files must CARRY by path — never rewritten")
    val hotAfter = after.files.filterNot(coldFiles.contains)
    assert(hotAfter.size >= 2, s"multi-file hot rewrite, got ${hotAfter.size}")
    // the locality payoff: the same narrow slice now prunes hot files
    val hotSliceAfter = store.prunedFiles(spark, dir, v,
      SnapshotStore.FilePredicate.between("x", 2001L, 2100L))
      .count(hotAfter.contains)
    assert(hotSliceAfter < hotAfter.size,
      s"z-ordered hot files must prune on x, kept $hotSliceAfter of ${hotAfter.size}")
    // content identical; range-read ≡ full-scan filter
    assert(store.read(spark, dir).count() == 1800L)
    val rangeRead = store.readAsOfWhere(spark, dir, v,
      SnapshotStore.FilePredicate.between("x", 2001L, 2100L))
      .agg(sum("x")).as[Long].head()
    val fullScan = store.read(spark, dir)
      .filter(col("x").between(2001L, 2100L)).agg(sum("x")).as[Long].head()
    assert(rangeRead == fullScan)
    // rewrite commits never surface in the file-grain change feed
    assert(store.readChangesSince(spark, dir, 2L, v).count() == 0L)
    // a predicate matching nothing is a NO-OP, not an empty commit
    assert(store.clusterWhere(spark, dir,
      SnapshotStore.FilePredicate.GtEq("x", 99999L), Seq("x", "y")) == v)
  }

  test("SQL face: OPTIMIZE ... WHERE ... ZORDER BY re-clusters just the " +
    "hot range; plain WHERE and plain ZORDER still dispatch correctly") {
    val dir = freshDir()
    val store = SnapshotStore
    store.commit(spark, dir,
      (1 to 400).map(i => (i.toLong, i.toLong % 20)).toDF("x", "y")
        .repartitionByRange(2, col("x")), "ingest")
    store.commitAppend(spark, dir,
      (1001 to 1400).map(i => (i.toLong, i.toLong % 20)).toDF("x", "y")
        .repartition(4), "append")
    val coldFiles = store.manifest(spark, dir, 2L)
      .files.filter(_.contains("v00000001"))
    val out = spark.sql(
      s"OPTIMIZE '$dir' WHERE x >= 1001 ZORDER BY (x, y)").collect()
    assert(out.length == 1 && out(0).getString(1) == "zorder")
    val m = store.manifest(spark, dir, out(0).getLong(0))
    assert(m.operation == "zorder")
    assert(coldFiles.forall(m.files.contains), "cold files carried")
    assert(store.read(spark, dir).count() == 800L)
    // untranslatable scoped-zorder conditions refuse like scoped compact
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"OPTIMIZE '$dir' WHERE x + y > 10 ZORDER BY (x)"))
    assert(e.getMessage.contains("does not translate"))
  }

  test("graft.targetFileSize (round 19): the property drives compact / " +
    "compactWhere / OPTIMIZE sizing; explicit API argument wins; typo'd " +
    "values refuse at the set") {
    val dir = freshDir()
    val store = SnapshotStore
    store.commit(spark, dir,
      (1 to 4000).map(i => (i.toLong, s"pad-$i-" + "x" * 40))
        .toDF("id", "txt").repartition(8), "ingest")
    // property-less compact lands everything in 1 file (tiny table vs
    // the 128 MB default)
    val v1 = store.compact(spark, dir)
    assert(store.manifest(spark, dir, v1).files.size == 1)
    val bytes = store.manifest(spark, dir, v1).stats.values.map(_.bytes).sum
    assert(bytes > 8L * 1024, s"need a multi-KB table, got $bytes")
    // declare a target that splits the table into several files
    store.setTableProperties(spark, dir,
      Map("graft.targetFileSize" -> (8L * 1024).toString))
    val v2 = store.compact(spark, dir)
    val expect = math.ceil(bytes.toDouble / (8L * 1024)).toLong
    val got = store.manifest(spark, dir, v2).files.size.toLong
    assert(got == expect, s"property-driven sizing: want $expect files, got $got")
    // the SQL verb reads the same property
    spark.sql(s"OPTIMIZE '$dir'")
    val v3 = store.latestVersion(spark, dir).get
    assert(store.manifest(spark, dir, v3).files.size.toLong >= expect - 1,
      "SQL OPTIMIZE sizes from the property too")
    // an explicit API argument overrides the property
    val v4 = store.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(store.manifest(spark, dir, v4).files.size == 1)
    // typo refusal at the set — the validator catches bad values
    val e = intercept[SnapshotStore.SnapshotPropertyException](
      store.setTableProperties(spark, dir,
        Map("graft.targetFileSize" -> "128mb")))
    assert(e.getMessage.contains("byte count"))
    val e2 = intercept[SnapshotStore.SnapshotPropertyException](
      store.setTableProperties(spark, dir,
        Map("graft.targetFileSize" -> "100")))
    assert(e2.getMessage.contains(">= 1024"))
  }
}
