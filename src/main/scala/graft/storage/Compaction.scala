package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the steady-state maintenance pass of any
  * long-lived table: streaming micro-batches and incremental ingests leave
  * thousands of KB-sized files per partition, and at 100 TB the resulting
  * task-per-file scheduling + NameNode/listing pressure dominate scan
  * cost long before the bytes do. Compaction rewrites a table directory
  * to ~`targetFileBytes` files, sized from the MEASURED on-disk footprint
  * (not row counts — compression ratios vary per table).
  *
  * The rewrite goes to a fresh directory and the swap is
  * rename-then-delete, so a reader holding the old directory keeps a
  * consistent view and a crashed compaction never corrupts the source
  * (the half-written output directory is simply abandoned).
  * [[compactClustered]] is the combined maintenance pass: compaction +
  * [[ZOrder.cluster]] scan-locality in ONE rewrite, with measured
  * z-locality in its stats; see its scaladoc for why [[Bucketing]]ed
  * layouts rewrite through the metastore path instead. */
object Compaction {

  final case class Stats(filesBefore: Long, bytesBefore: Long,
                         filesAfter: Long)

  private def listDataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        buf += ((f.getPath.toString, f.getLen))
    }
    buf.toSeq
  }

  /** Compact the FLAT parquet table at `dir` in place (swap via a sibling
    * temp directory). Returns before/after stats.
    *
    * Hive-partitioned layouts (`dir/col=value/...`) are refused: a flat
    * rewrite would silently drop the partition structure (and with it
    * pruning and any external-table definition). Compact those one
    * partition DIRECTORY at a time — each leaf directory is itself a flat
    * parquet table this function handles.
    *
    * Crash protocol: the rewrite lands in `<dir>.__compact_tmp` first;
    * the source moves to `<dir>.__compact_old` only after the rewrite
    * completed, and is deleted only after the new directory is in place
    * — every rename is CHECKED and a failed swap rolls the source back.
    * A crash can strand a `__compact_tmp` (harmless, rebuilt next run) or
    * a `__compact_old` (detected FIRST next run — before any listing, so
    * the case where the crash landed between the two renames and `dir`
    * itself is absent still gets the recovery message — and refused,
    * never silently merged). Readers hold a consistent view through the
    * swap with one caveat: between the two renames there is a brief
    * window where `dir` does not exist, so a reader LISTING the directory
    * exactly then fails and must retry; a reader that already resolved
    * its file list keeps reading the old files it holds. */
  def compactParquet(spark: SparkSession, dir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Stats = {
    val (before, totalBytes, nFiles) = guardAndMeasure(spark, dir, targetFileBytes)
    if (before.length <= nFiles)
      return Stats(before.length, totalBytes, before.length)
    rewriteAndSwap(spark, dir) { tmp =>
      spark.read.parquet(dir)
        .repartition(nFiles.toInt)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    Stats(before.length, totalBytes, listDataFiles(spark, dir).length)
  }

  /** Pre-rewrite guards + measured sizing, shared by both entry points so
    * the crash-recovery contract cannot drift between them. Refuses a
    * stranded `__compact_old` FIRST (after a crash between the renames the
    * source sits there and `dir` is gone — listing `dir` before this check
    * would throw FileNotFoundException and mask the recovery path), then
    * refuses Hive-partitioned layouts. Returns (files, totalBytes,
    * targetFileCount). */
  private def guardAndMeasure(spark: SparkSession, dir: String,
      targetFileBytes: Long): (Seq[(String, Long)], Long, Long) = {
    require(targetFileBytes > 0)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$dir.__compact_old")
    require(!fs.exists(old),
      s"$old exists — a previous compaction crashed mid-swap; verify which " +
        s"copy is current (a missing $dir means the crash hit between the " +
        s"renames: restore with rename($old, $dir) after checking " +
        s"$dir.__compact_tmp) and remove the stale one before compacting again")
    val partitioned = listDataFiles(spark, dir).exists { case (path, _) =>
      path.stripPrefix(fs.makeQualified(p).toString).split('/')
        .exists(_.contains("="))
    }
    require(!partitioned,
      s"$dir is Hive-partitioned; compact each partition directory " +
        "separately to preserve the layout")
    val before = listDataFiles(spark, dir)
    val totalBytes = before.map(_._2).sum
    val nFiles = math.max(1L, math.ceil(totalBytes.toDouble / targetFileBytes).toLong)
    (before, totalBytes, nFiles)
  }

  /** The swap half of the crash protocol, shared by both entry points:
    * `rewrite` lands the new layout in `<dir>.__compact_tmp`, then the
    * source moves to `<dir>.__compact_old`, the tmp directory is installed
    * as `dir`, and only then is the old copy deleted — every rename is
    * CHECKED and a failed install rolls the source back untouched. */
  private def rewriteAndSwap(spark: SparkSession, dir: String)
      (rewrite: String => Unit): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$dir.__compact_old")
    val tmp = new Path(s"$dir.__compact_tmp")
    rewrite(tmp.toString)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compaction aborted: could not move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back; source was untouched
      throw new java.io.IOException(
        s"compaction aborted: could not install $tmp; source restored")
    }
    fs.delete(old, true)
  }

  final case class ClusterStats(filesBefore: Long, bytesBefore: Long,
                                filesAfter: Long, zSpanRatio: Double)

  /** One-pass maintenance rewrite: compact the flat parquet table at `dir`
    * AND restore (x, y) scan locality by [[ZOrder.cluster]]ing the rows in
    * the same rewrite — the combined pass the two operators' docs promise,
    * at the cost of one table read instead of two. Same guards and crash
    * protocol as [[compactParquet]] (tmp-dir rewrite, checked
    * rename-then-delete swap, stranded `__compact_old` refused first).
    * Unlike plain compaction it always rewrites — an already-compact table
    * may still be badly clustered, and clustering is the point.
    *
    * Bucketed tables are out of scope by CONSTRUCTION, not omission: plain
    * parquet directories carry no bucket metadata (it lives in the
    * metastore), so a directory swap cannot preserve bucketing — re-write
    * through [[Bucketing.writeBucketed]] (optionally with the z-value as a
    * sort column, which composes bucket co-location with within-bucket
    * z-locality) for that layout.
    *
    * Returns before/after file stats plus `zSpanRatio` — the MEASURED
    * locality: Σ per-file z-range spans / global z-range span. A perfectly
    * clustered layout (disjoint per-file z-ranges) scores ~1; a random
    * layout scores ~filesAfter. Computed by one bounded scan of the
    * rewritten table (per-file min/max aggregation — the same stats a
    * format's row-group index would hold). */
  def compactClustered(spark: SparkSession, dir: String,
                       xCol: String, yCol: String,
                       targetFileBytes: Long = 128L * 1024 * 1024,
                       bits: Int = 16): ClusterStats = {
    val (before, totalBytes, nFiles) = guardAndMeasure(spark, dir, targetFileBytes)
    rewriteAndSwap(spark, dir) { tmp =>
      ZOrder.cluster(spark.read.parquet(dir), xCol, yCol, nFiles.toInt, bits)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    // measured z-locality of the installed layout: bounded per-file min/max.
    // Rows with a null x/y have no z position — they cluster into the
    // trailing files but carry no span information, so they are excluded
    // from the measurement rather than letting a null aggregate NPE make a
    // successful (already-swapped) compaction look failed.
    import org.apache.spark.sql.functions._
    val z = ZOrder.zValue(col(xCol), col(yCol), bits)
    val spans = spark.read.parquet(dir)
      .select(input_file_name().as("__f"), z.as("__z"))
      .where(col("__z").isNotNull)
      .groupBy(col("__f"))
      .agg(min(col("__z")).as("lo"), max(col("__z")).as("hi"))
      .collect()
    val filesAfter = listDataFiles(spark, dir).length.toLong
    val ratio =
      if (spans.length <= 1) 1.0
      else {
        val globalSpan =
          (spans.map(_.getLong(2)).max - spans.map(_.getLong(1)).min).toDouble
        if (globalSpan == 0) 1.0
        else spans.map(r => (r.getLong(2) - r.getLong(1)).toDouble).sum / globalSpan
      }
    ClusterStats(before.length, totalBytes, filesAfter, ratio)
  }
}
