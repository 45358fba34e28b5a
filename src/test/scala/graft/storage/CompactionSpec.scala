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

  test("partitioned layouts are refused, not silently flattened") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact3").toString + "/t"
    (1 to 100).map(i => (i, s"d${i % 3}")).toDF("id", "date")
      .write.partitionBy("date").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
  }

  test("stale crash leftovers block compaction instead of corrupting the swap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact4").toString + "/t"
    (1 to 100).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    // simulate a crashed previous run
    new java.io.File(s"$dir.__compact_old").mkdirs()
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    }
    assert(e.getMessage.contains("crashed"), e.getMessage)
    // the source is untouched
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("clustered compaction compacts AND z-orders in one rewrite, measured") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compactz").toString + "/t"
    // fragmented AND badly clustered: round-robin partitions scatter every
    // z-range across every file
    (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
      .repartition(32)
      .write.parquet(dir)
    val checksum = spark.read.parquet(dir).agg(sum(col("id"))).head().getLong(0)
    val stats = Compaction.compactClustered(spark, dir, "x", "y",
      targetFileBytes = 32L * 1024, bits = 8)
    assert(stats.filesBefore == 32)
    assert(stats.filesAfter < 32 && stats.filesAfter > 1,
      s"expected a multi-file compacted layout, got ${stats.filesAfter}")
    // locality is MEASURED: near-disjoint per-file z-ranges score ~1
    // (±1 file-boundary overlap from range-partition sampling); a random
    // layout would score ~filesAfter
    assert(stats.zSpanRatio < 2.0,
      s"z-span ratio ${stats.zSpanRatio} — clustering did not take")
    val after = spark.read.parquet(dir)
    assert(after.count() == 4096)
    assert(after.agg(sum(col("id"))).head().getLong(0) == checksum)
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("__compact")),
      s"swap must clean up, found ${parent.toSeq}")
  }

  test("clustered compaction survives null x/y rows (span measured on the rest)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compactz3").toString + "/t"
    // null coordinates carry no z position; the post-swap locality
    // measurement must skip them instead of NPE-ing on a null aggregate
    // after the swap already succeeded
    (0 until 1024).map { i =>
      if (i % 5 == 0) (i.toLong, None: Option[Long], None: Option[Long])
      else (i.toLong, Some((i % 32).toLong), Some((i / 32).toLong))
    }.toDF("id", "x", "y")
      .repartition(16)
      .write.parquet(dir)
    val stats = Compaction.compactClustered(spark, dir, "x", "y",
      targetFileBytes = 32L * 1024, bits = 8)
    assert(stats.filesBefore == 16)
    assert(!stats.zSpanRatio.isNaN && stats.zSpanRatio >= 1.0 - 1e-9,
      s"ratio must be a real measurement, got ${stats.zSpanRatio}")
    val after = spark.read.parquet(dir)
    assert(after.count() == 1024)
    assert(after.where(col("x").isNull).count() == 205)
  }

  test("clustered compaction refuses a crash-stranded __compact_old first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compactz2").toString + "/t"
    (1 to 100).map(i => (i.toLong, i.toLong, i.toLong)).toDF("id", "x", "y")
      .repartition(4).write.parquet(dir)
    new java.io.File(s"$dir.__compact_old").mkdirs()
    val e = intercept[IllegalArgumentException] {
      Compaction.compactClustered(spark, dir, "x", "y")
    }
    assert(e.getMessage.contains("crashed"), e.getMessage)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("crash between the renames (dir absent) is detected, not a FileNotFound") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compactz3").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    // simulate the window between rename(dir, old) and rename(tmp, dir):
    // the source sits at __compact_old and dir itself is GONE
    assert(new java.io.File(dir)
      .renameTo(new java.io.File(s"$dir.__compact_old")))
    val e = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("crashed"), e.getMessage)
    assert(e.getMessage.contains("missing"), e.getMessage)
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
