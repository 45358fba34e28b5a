package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the PER-COMMIT (O(changed)) row-grain change feed
  * (round 20 — the Delta commit-scoped CDF shape): an adjacent-version
  * [[SnapshotStore.readRowChanges]] derives its answer from the
  * commit's OWN action delta — added files, removed files, and the
  * deletion-vector entries it changed — never a join of the two
  * complete boundary snapshots. Asserted three ways: (1) equivalence
  * against the boundary join across a full operation mix (append, CoW
  * merge/delete, DV delete/merge, schema evolution, compact, restore);
  * (2) the scan fence — a one-commit feed lists ONLY the commit's
  * changed files, never the table's; (3) vector-shrink resurrection
  * (restore past a DV delete) surfaces through the same path. */
class SnapshotCommitCdfSpec extends SparkSpec {

  import spark.implicits._

  private val store = SnapshotStore

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapccdf").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def changeSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => null
      case v => v
    }).toSet

  test("per-commit CDF ≡ boundary join on every adjacent pair across " +
    "the full operation mix; rewrite and metadata commits are empty") {
    val dir = freshDir()
    store.commit(spark, dir,
      (1L to 400L).map(i => (i, s"t$i", i % 7)).toDF("id", "txt", "n")
        .repartitionByRange(8, col("id")), "ingest")              // v1
    store.commitAppend(spark, dir,
      Seq((401L, "x", 1L), (402L, "y", 2L)).toDF("id", "txt", "n"),
      "append")                                                   // v2
    store.merge(spark, dir,
      Seq((5L, "T5", 99L), (403L, "z", 3L)).toDF("id", "txt", "n"),
      Seq("id"))                                                  // v3 CoW upsert
    store.deleteWhereDv(spark, dir, SnapshotStore.FilePredicate.EqTo("id", 7L))   // v4 DV delete
    store.mergeDv(spark, dir,
      Seq((9L, "T9", 88L), (404L, "w", 4L)).toDF("id", "txt", "n"),
      Seq("id"))                                                  // v5 DV merge
    store.deleteWhere(spark, dir, SnapshotStore.FilePredicate.EqTo("id", 11L))    // v6 CoW delete
    store.compact(spark, dir)                                     // v7 rewrite
    store.commitAppend(spark, dir,
      Seq((405L, "v", 5L, true)).toDF("id", "txt", "n", "flag"),
      "append")                                                   // v8 evolution
    store.setTableProperties(spark, dir, Map("user.note" -> "m")) // v9 metadata
    store.restore(spark, dir, 5L)                                 // v10 restore
    val latest = store.latestVersion(spark, dir).get
    assert(latest == 10L)
    for (v <- 2L to latest) {
      val per = store.readRowChanges(spark, dir, v - 1, v, Seq("id"))
      val scan = store.lastRowChangesScan
      val boundary =
        store.readRowChangesBoundary(spark, dir, v - 1, v, Seq("id"))
      assert(per.columns.toSeq == boundary.columns.toSeq,
        s"v${v - 1}->$v column order")
      val a = changeSet(per)
      val b = changeSet(boundary)
      assert(a == b,
        s"v${v - 1}->$v per-commit != boundary:\n  only-per=${a -- b}\n" +
          s"  only-boundary=${b -- a}")
      assert(scan.mode != "boundary",
        s"v${v - 1}->$v must decompose (got ${scan.mode})")
      if (scan.mode == "per-commit") {
        // the O(changed) fence: nothing outside the commit's own delta
        val d = store.manifest(spark, dir, v)
        val p = store.manifest(spark, dir, v - 1)
        val priorSet = p.files.toSet
        val changed = (d.files.filterNot(priorSet) ++            // added
          p.files.filterNot(d.files.toSet) ++                    // removed
          d.files.filter(f => priorSet(f) &&
            p.dvs.get(f) != d.dvs.get(f))).toSet                 // dv delta
        assert(scan.dataFiles.toSet.subsetOf(changed),
          s"v${v - 1}->$v scanned ${scan.dataFiles.toSet -- changed} " +
            "outside the commit's delta")
      }
    }
    // the rewrite (v6->v7) and metadata (v8->v9) steps are empty feeds
    assert(store.readRowChanges(spark, dir, 6L, 7L, Seq("id")).count() == 0L)
    store.readRowChanges(spark, dir, 6L, 7L, Seq("id"))
    assert(store.lastRowChangesScan.mode == "rewrite")
    assert(store.readRowChanges(spark, dir, 8L, 9L, Seq("id")).count() == 0L)
    store.readRowChanges(spark, dir, 8L, 9L, Seq("id"))
    assert(store.lastRowChangesScan.mode == "metadata")
    // non-adjacent stays the NET boundary diff
    store.readRowChanges(spark, dir, 1L, 5L, Seq("id")).count()
    assert(store.lastRowChangesScan.mode == "boundary")
  }

  test("one-commit table_changes scans ONLY the commit's changed " +
    "files — the O(changed) fence over the SQL face; a DV point " +
    "delete touches exactly the marked file") {
    val dir = freshDir()
    store.commit(spark, dir,
      (1L to 800L).map(i => (i, s"d$i")).toDF("id", "txt")
        .repartitionByRange(8, col("id")), "ingest",
      tblProperties = Map("graft.cdfKeys" -> "id"))               // v1: 8 files
    val m1 = store.manifest(spark, dir, 1L)
    assert(m1.files.size == 8)
    store.commitAppend(spark, dir,
      Seq((801L, "new")).toDF("id", "txt"), "append")             // v2
    val got = store.readTableChanges(spark, dir, 1L, Some(2L))
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("insert", 801L)))
    val s2 = store.lastRowChangesScan
    assert(s2.mode == "per-commit", s"append step: ${s2.mode}")
    assert(s2.dataFiles.forall(f => !m1.files.contains(f)),
      s"an append's feed must not touch any v1 file: ${s2.dataFiles}")
    assert(s2.dataFiles.size < m1.files.size,
      "the scan is O(changed), not O(table)")
    // DV point delete: the feed scans the ONE file whose vector changed
    store.deleteWhereDv(spark, dir, SnapshotStore.FilePredicate.EqTo("id", 42L))  // v3
    val del = store.readTableChanges(spark, dir, 2L, Some(3L))
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(del == Set(("delete", 42L)))
    val s3 = store.lastRowChangesScan
    assert(s3.mode == "per-commit")
    assert(s3.dataFiles.size == 1,
      s"a range-laid-out point delete marks one file, scanned ${s3.dataFiles}")
    // the streaming CDF source pays the same per-commit path when its
    // micro-batches step one version at a time
    val gotStream =
      scala.collection.mutable.Set.empty[(Long, String, String)]
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .option("maxVersionsPerTrigger", "1")
      .load(dir)
      .writeStream.option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ccdf-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotStream ++= b.as[(Long, String, String)].collect(); ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(gotStream == Set((801L, "new", "insert"), (42L, "d42", "delete")),
      s"streamed per-version CDF, got $gotStream")
  }

  test("a vector-SHRINK commit (restore past a DV delete) resurrects " +
    "rows through the per-commit path, scanning only the shrunk file") {
    val dir = freshDir()
    store.commit(spark, dir,
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "txt")
        .repartitionByRange(4, col("id")), "ingest")              // v1
    store.deleteWhereDv(spark, dir, SnapshotStore.FilePredicate.EqTo("id", 10L))  // v2
    store.restore(spark, dir, 1L)                                 // v3: shrink
    val per = store.readRowChanges(spark, dir, 2L, 3L, Seq("id"))
    val scan = store.lastRowChangesScan
    val a = changeSet(per)
    val b = changeSet(
      store.readRowChangesBoundary(spark, dir, 2L, 3L, Seq("id")))
    assert(a == b, s"resurrection step: per=$a boundary=$b")
    assert(a.map(r => (r.head, r.last)) == Set((10L, "insert")),
      s"the restored row surfaces as an insert, got $a")
    assert(scan.mode == "per-commit")
    assert(scan.dataFiles.size == 1,
      s"only the shrunk file scans: ${scan.dataFiles}")
  }
}
