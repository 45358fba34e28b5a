package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the LAZY, checkpoint-backed SQL read path (round 20 —
  * the SQL face of the distributed pruning tier): a registered
  * graft-snapshot table whose version is served by a parquet
  * checkpoint resolves through [[SnapshotCheckpointFileIndex]] — the
  * relation rides the commit HEADER (one small read), and a selective
  * SELECT prunes through the DISTRIBUTED checkpoint scan, so the
  * driver materializes the surviving file entries only. Fenced on the
  * plan (the scan's Location names the lazy index) AND on
  * [[SnapshotStore.lastDistributedPrune]] (entries scanned
  * distributed, survivors materialized). Deletion vectors at a
  * checkpoint-COINCIDENT version must still mask (the round-20
  * distributed-prune DV fix, driven end-to-end through SQL). */
class SnapshotSqlDistributedPruneSpec extends SparkSpec {

  import spark.implicits._

  private val store = SnapshotStore

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapsqldp").toFile
    d.delete()
    d.getAbsolutePath
  }

  /** the lazy tier engages above [[SnapshotStore.LazyRelationMinEntries]]
    * (driver materialization wins on small states at any scale) — these
    * toy tables drive the path through the spec seam */
  private def withLazyTier[A](body: => A): A = {
    val prev = SnapshotStore.LazyRelationMinEntries
    SnapshotStore.LazyRelationMinEntries = 0L
    SnapshotStore.clearCkptInfoCacheForTest()
    try body finally {
      SnapshotStore.LazyRelationMinEntries = prev
      SnapshotStore.clearCkptInfoCacheForTest()
    }
  }

  test("a selective SQL read on a checkpointed table routes through the " +
    "lazy index: survivors-only driver materialization, plan-fenced") {
    withLazyTier {
    val dir = freshDir()
    store.commit(spark, dir,
      (1L to 800L).map(i => (i, s"d$i", i % 5)).toDF("id", "txt", "n")
        .repartitionByRange(8, col("id")), "ingest",
      tblProperties = Map("graft.checkpointInterval" -> "2"))      // v1
    store.commitAppend(spark, dir,
      Seq((801L, "x", 1L)).toDF("id", "txt", "n"), "append")       // v2 +ckpt
    store.commitAppend(spark, dir,
      Seq((802L, "y", 2L)).toDF("id", "txt", "n"), "append")       // v3 tail
    val tbl = "sqldp_t1"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      val total = store.manifest(spark, dir, 3L).files.size
      val df = spark.sql(s"SELECT id, txt FROM $tbl WHERE id = 42")
      // plan fence: the scan's file listing IS the lazy index
      assert(df.queryExecution.executedPlan.toString
        .contains("SnapshotCheckpointFileIndex"),
        s"the SQL scan must ride the checkpoint-backed index:\n" +
          df.queryExecution.executedPlan.toString.take(2000))
      assert(df.as[(Long, String)].collect().toSeq == Seq((42L, "d42")))
      val (scanned, materialized) = store.lastDistributedPrune
      assert(scanned == store.manifest(spark, dir, 2L).files.size.toLong,
        s"the v2 checkpoint's entries scan DISTRIBUTED, got $scanned")
      assert(materialized < total,
        s"the driver must hold survivors only: $materialized of $total")
      // unfiltered SELECT falls back to the full listing — same answers
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) ==
        802L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("deletion vectors MASK at a checkpoint-coincident version through " +
    "the lazy SQL path (the distributed-prune DV fix, end-to-end); DML " +
    "on the lazy-index table keeps routing through the store") {
    withLazyTier {
    val dir = freshDir()
    store.commit(spark, dir,
      (1L to 400L).map(i => (i, s"d$i")).toDF("id", "txt")
        .repartitionByRange(4, col("id")), "ingest",
      tblProperties = Map("graft.checkpointInterval" -> "2"))      // v1
    val tbl = "sqldp_t2"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      store.deleteWhereDv(spark, dir,
        SnapshotStore.FilePredicate.EqTo("id", 7L))                // v2 +ckpt
      assert(store.readCheckpointForTest(spark, dir, 2L).isDefined,
        "v2 must be checkpoint-coincident for this fence")
      // selective read AT the checkpointed version with a live vector:
      // the deleted row must not resurrect
      val hit = spark.sql(s"SELECT id FROM $tbl WHERE id IN (6, 7, 8)")
      assert(hit.queryExecution.executedPlan.toString
        .contains("SnapshotCheckpointFileIndex"))
      assert(hit.as[Long].collect().toSet == Set(6L, 8L),
        "the DV-masked row resurrected through the lazy path")
      // and a range predicate spanning the vectored file
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id <= 10")
        .head().getLong(0) == 9L)
      // DML on the lazy-index relation still routes through the store
      spark.sql(s"UPDATE $tbl SET txt = 'X' WHERE id = 9")         // v3
      assert(spark.sql(s"SELECT txt FROM $tbl WHERE id = 9")
        .as[String].head() == "X")
      assert(store.latestVersion(spark, dir).contains(3L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("a RENAMED (column-mapped) checkpointed table reads through the " +
    "lazy overlay: logical names surface, the physical scan prunes") {
    withLazyTier {
    val dir = freshDir()
    store.commit(spark, dir,
      (1L to 200L).map(i => (i, s"d$i")).toDF("id", "body")
        .repartitionByRange(4, col("id")), "ingest",
      tblProperties = Map("graft.checkpointInterval" -> "2"))      // v1
    store.renameColumn(spark, dir, "body", "text")                 // v2 +ckpt
    val tbl = "sqldp_t3"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      val df = spark.sql(s"SELECT text FROM $tbl WHERE id = 5")
      assert(df.queryExecution.executedPlan.toString
        .contains("SnapshotCheckpointFileIndex"),
        "the mapped read's rebuild must stay on the lazy index")
      assert(df.as[String].collect().toSeq == Seq("d5"))
      val (_, materialized) = store.lastDistributedPrune
      assert(materialized < store.manifest(spark, dir, 2L).files.size,
        "the mapped read still prunes distributed")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
