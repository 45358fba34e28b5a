package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Contract of the transactional snapshot manifest: atomic commits,
  * time travel, torn-commit invisibility, maintenance commits that
  * preserve logical content, and vacuum that can only reclaim
  * unreferenced files. */
class SnapshotStoreSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapstore").toFile
    d.delete() // store initializes its own layout
    d.getAbsolutePath
  }

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("commit / readAsOf: every version reads back exactly what was committed") {
    val dir = freshDir()
    val v1 = SnapshotStore.commit(spark, dir, docs(1L -> "a", 2L -> "b"), "ingest")
    val v2 = SnapshotStore.commit(spark, dir, docs(1L -> "a", 3L -> "c"), "upsert")
    assert((v1, v2) == ((1L, 2L)))
    assert(SnapshotStore.versions(spark, dir) == Seq(1L, 2L))
    assert(SnapshotStore.readAsOf(spark, dir, 1L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq == Seq(1L -> "a", 2L -> "b"))
    assert(SnapshotStore.readAsOf(spark, dir, 2L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq == Seq(1L -> "a", 3L -> "c"))
    // latest read = v2
    assert(SnapshotStore.read(spark, dir).count() == 2L)
  }

  test("torn commit is INVISIBLE: data files without a manifest do not exist") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs(1L -> "a"), "ingest")
    // simulate a crash between the data write and the manifest rename:
    // the data directory of would-be v2 exists, the manifest does not
    docs(9L -> "torn").write.parquet(s"$dir/data/v00000002-upsert")
    assert(SnapshotStore.latestVersion(spark, dir).contains(1L),
      "an uncommitted data dir must not surface as a version")
    assert(SnapshotStore.read(spark, dir).as[(Long, String)].collect().toSeq ==
      Seq(1L -> "a"), "reads must see only committed content")
    // and the NEXT committer refuses to reuse the orphaned directory
    // rather than silently absorbing the torn data
    intercept[IllegalArgumentException] {
      SnapshotStore.commit(spark, dir, docs(2L -> "b"), "upsert")
    }
    // vacuum reclaims the orphan; then the commit proceeds as v2
    SnapshotStore.vacuum(spark, dir, retain = 1)
    assert(SnapshotStore.commit(spark, dir, docs(2L -> "b"), "upsert") == 2L)
    assert(SnapshotStore.read(spark, dir).as[(Long, String)].collect().toSeq ==
      Seq(2L -> "b"))
  }

  test("compact commits a new version with IDENTICAL logical content; old versions intact") {
    val dir = freshDir()
    val df = (1L to 50L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .repartition(8) // many small files
    SnapshotStore.commit(spark, dir, df, "ingest")
    val v = SnapshotStore.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(v == 2L)
    assert(SnapshotStore.manifest(spark, dir, 2L).operation == "compact")
    assert(SnapshotStore.manifest(spark, dir, 2L).files.length <
      SnapshotStore.manifest(spark, dir, 1L).files.length,
      "compaction must reduce the file count")
    def content(ver: Long) = SnapshotStore.readAsOf(spark, dir, ver)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(content(1L) == content(2L), "compaction must not change rows")
  }

  test("cluster (z-order) commits a maintenance version through the same protocol") {
    val dir = freshDir()
    val df = (1L to 100L).map(i => (i, i % 10, (i * 7) % 10))
      .toDF("doc_id", "x", "y")
    SnapshotStore.commit(spark, dir, df, "ingest")
    val v = SnapshotStore.cluster(spark, dir, "x", "y", nFiles = 4)
    assert(v == 2L && SnapshotStore.manifest(spark, dir, 2L).operation == "zorder")
    assert(SnapshotStore.readAsOf(spark, dir, 2L).count() == 100L)
    assert(SnapshotStore.readAsOf(spark, dir, 1L).count() == 100L)
  }

  test("vacuum drops only unretained versions' files; retained reads survive") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs(1L -> "a"), "ingest")
    SnapshotStore.commit(spark, dir, docs(2L -> "b"), "upsert")
    SnapshotStore.commit(spark, dir, docs(3L -> "c"), "upsert")
    SnapshotStore.vacuum(spark, dir, retain = 2)
    assert(SnapshotStore.versions(spark, dir) == Seq(2L, 3L))
    // v1's files are gone
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$dir/data/v00000001-ingest")))
    // retained versions still read
    assert(SnapshotStore.readAsOf(spark, dir, 2L).count() == 1L)
    assert(SnapshotStore.readAsOf(spark, dir, 3L).count() == 1L)
    intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, dir, 1L)
    }
  }

  test("a commit race is DETECTED, never silently absorbed") {
    // Sequentially observable collision surfaces of the two-phase commit
    // (a rival manifest that is already FULLY committed simply bumps
    // latestVersion, so the next writer targets the next slot — no race;
    // the races live in the staging artifacts):
    val dir = freshDir()
    SnapshotStore.commit(spark, dir, docs(1L -> "a"), "ingest")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // (1) a rival mid-commit holds version 2's STAGED manifest: our
    // create(tmp, overwrite = false) must refuse, loudly
    val staged = new Path(s"$dir/_manifests/.v00000002.json.tmp")
    val out = fs.create(staged, false)
    out.write("{}".getBytes("UTF-8")); out.close()
    val stagedLen = fs.getFileStatus(staged).getLen
    intercept[java.io.IOException] {
      SnapshotStore.commit(spark, dir, docs(9L -> "loser"), "upsert")
    }
    assert(fs.getFileStatus(staged).getLen == stagedLen,
      "the rival's staged manifest must survive untouched")
    assert(SnapshotStore.latestVersion(spark, dir).contains(1L),
      "no torn version may surface")
    fs.delete(staged, false)
    // (2) our aborted attempt stranded version 2's data dir; the NEXT
    // committer refuses to reuse it (the dir claim is the other race
    // guard) until vacuum reclaims the orphan
    intercept[IllegalArgumentException] {
      SnapshotStore.commit(spark, dir, docs(9L -> "again"), "upsert")
    }
    SnapshotStore.vacuum(spark, dir, retain = 1)
    assert(SnapshotStore.commit(spark, dir, docs(9L -> "again"), "upsert") == 2L)
    assert(SnapshotStore.readAsOf(spark, dir, 2L)
      .as[(Long, String)].collect().toSet == Set(9L -> "again"),
      "full-snapshot commit semantics")
  }

  test("diffVersions composes CorpusDiff across the manifest log") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      docs(1L -> "same", 2L -> "old", 3L -> "gone"), "ingest")
    SnapshotStore.commit(spark, dir,
      docs(1L -> "same", 2L -> "new", 4L -> "born"), "upsert")
    val d = SnapshotStore.diffVersions(spark, dir, 1L, 2L, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "unchanged", 2L -> "modified",
      3L -> "removed", 4L -> "added"))
  }
}
