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
}
