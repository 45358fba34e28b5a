package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction shrinks the file count, preserves data, and swaps atomically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // simulate a micro-batch-fragmented table: 32 files for tiny data
    (1 to 2000).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
      .repartition(32)
      .write.parquet(dir)
    val checksum = spark.read.parquet(dir).agg(sum(col("id"))).head().getLong(0)

    val stats = Compaction.compactParquet(spark, dir,
      targetFileBytes = 64L * 1024 * 1024)
    assert(stats.filesBefore == 32)
    assert(stats.filesAfter == 1,
      s"tiny table must compact to one file, got ${stats.filesAfter}")
    val after = spark.read.parquet(dir)
    assert(after.count() == 2000)
    assert(after.agg(sum(col("id"))).head().getLong(0) == checksum)
    // no leftover temp/old directories
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("__compact")),
      s"swap must clean up, found ${parent.toSeq}")
  }

  test("already-compact tables are left untouched (no rewrite)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString + "/t"
    (1 to 100).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1).write.parquet(dir)
    val modBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified()).toSeq
    val stats = Compaction.compactParquet(spark, dir)
    val modAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified()).toSeq
    assert(stats.filesBefore == stats.filesAfter)
    assert(modBefore == modAfter, "no-op compaction must not rewrite files")
  }
}
