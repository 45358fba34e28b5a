package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Transactional snapshot manifest — the commit-log layer that binds
  * ingest ∘ compaction ∘ Z-order into ATOMIC, readable-as-of versions
  * (the piece a real 100 TB lakehouse deployment reaches for weekly; the
  * public Delta/Iceberg model at its irreducible core: immutable data
  * files + an append-only manifest log + one atomic pointer move per
  * commit).
  *
  * Layout:
  * {{{
  *   <table>/data/v<version>-<op>/part-*.parquet   (immutable once committed)
  *   <table>/_manifests/v<%08d-version>.json       (the commit log)
  * }}}
  *
  * A manifest lists the FULL data-file set of its version (snapshot
  * isolation by construction — no log replay needed to read), plus the
  * operation that produced it. The COMMIT POINT is the manifest's
  * temp-write + rename: data files land first in a version-private
  * directory that no committed manifest references, then the manifest
  * file appears atomically (single-file rename — atomic on HDFS and
  * POSIX). A crash before the rename strands an orphaned data directory
  * that NO reader can see (torn commits are invisible — spec-proven by
  * killing a commit between the two steps); vacuum reclaims orphans.
  *
  * Readers: [[latestVersion]] = max manifest present; [[readAsOf]] reads
  * the listed files of any retained version — time travel is one
  * manifest read, not a log replay. Writers are single-writer by
  * contract (the reference deployment's scheduler discipline); the
  * rename-based commit makes a lost race DETECTABLE (rename onto an
  * existing manifest fails) rather than corrupting.
  *
  * Scale shape: a manifest holds one line per data FILE (not per row) —
  * a 100 TB table at 128 MB files is ~800k entries, a driver-side JSON
  * read; data files never rewrite on commit, so commit cost is O(new
  * files). Maintenance ops ([[compact]], [[cluster]]) rewrite data into
  * NEW version directories and commit — readers of older versions keep
  * their files (nothing is deleted until [[vacuum]] drops versions older
  * than the retention horizon).
  */
object SnapshotStore {

  final case class Manifest(version: Long, operation: String,
                            files: Seq[String])

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = s"$dir/_manifests"

  private def manifestPath(dir: String, v: Long) =
    new Path(f"${manifestDir(dir)}/v$v%08d.json")

  // minimal JSON codec (manifests are engine-internal, schema fixed here;
  // no external JSON dependency — build.sbt is frozen)
  private def render(m: Manifest): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"version": ${m.version}, "operation": ${q(m.operation)},
       | "files": [${m.files.map(q).mkString(", ")}]}""".stripMargin
  }

  private def parse(json: String): Manifest = {
    val v = """"version":\s*(\d+)""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"manifest missing version: $json")).group(1).toLong
    val op = """"operation":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"manifest missing operation: $json")).group(1)
    val filesBlock = """"files":\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"manifest missing files: $json")).group(1)
    val files = """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(filesBlock)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    Manifest(v, op.replace("\\\"", "\"").replace("\\\\", "\\"), files)
  }

  /** All committed versions, ascending (empty for an uninitialized dir). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val md = new Path(manifestDir(dir))
    val f = fs(spark, dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  /** The committed manifest of `version`. */
  def manifest(spark: SparkSession, dir: String, version: Long): Manifest = {
    val p = manifestPath(dir, version)
    val f = fs(spark, dir)
    require(f.exists(p), s"version $version is not committed at $dir")
    val in = f.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parse(json)
  }

  /** Read the table as of `version` — one manifest read, then a parquet
    * scan of exactly its files (immutable, so the read is consistent no
    * matter what later commits or maintenance do). */
  def readAsOf(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val m = manifest(spark, dir, version)
    require(m.files.nonEmpty, s"version $version holds no data files")
    spark.read.parquet(m.files: _*)
  }

  /** Read the latest committed version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAsOf(spark, dir,
      latestVersion(spark, dir)
        .getOrElse(sys.error(s"no committed version at $dir")))

  private def listParquet(spark: SparkSession, d: String): Seq[String] = {
    val p = new Path(d)
    val f = fs(spark, d)
    val it = f.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        buf += st.getPath.toString
    }
    buf.toSeq.sorted
  }

  /** Commit `df` as the next version (full-snapshot semantics: the new
    * version IS `df`). Data lands in a version-private directory first;
    * the version exists only once the manifest rename succeeds — the one
    * atomic step. Returns the committed version. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
             operation: String): Long =
    commitFiles(spark, dir, operation) { dataDir =>
      df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    }

  /** APPEND commit: the new version = previous version's file set plus
    * `delta`'s files — only the delta's bytes are written (the Delta-style
    * incremental ingest shape: commit cost O(new files), history never
    * rewritten). With no prior version this is [[commit]]. */
  def commitAppend(spark: SparkSession, dir: String, delta: DataFrame,
                   operation: String): Long = {
    val priorFiles = latestVersion(spark, dir)
      .map(v => manifest(spark, dir, v).files).getOrElse(Seq.empty)
    commitFiles(spark, dir, operation, priorFiles) { dataDir =>
      delta.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    }
  }

  /** The shared two-phase commit: `write` materializes data files into
    * the fresh version directory, then the manifest appears atomically.
    * Split out so maintenance rewrites ([[compact]], [[cluster]]) share
    * the exact protocol — the crash contract cannot drift per operation. */
  private def commitFiles(spark: SparkSession, dir: String,
                          operation: String,
                          carryFiles: Seq[String] = Seq.empty)
                         (write: String => Unit): Long = {
    val f = fs(spark, dir)
    val v = latestVersion(spark, dir).getOrElse(0L) + 1
    val dataDir = f"$dir/data/v$v%08d-$operation"
    require(!f.exists(new Path(dataDir)),
      s"$dataDir already exists — a concurrent or crashed commit owns it")
    write(dataDir)
    val m = Manifest(v, operation, carryFiles ++ listParquet(spark, dataDir))
    require(m.files.nonEmpty, s"commit of version $v wrote no data files")
    // COMMIT POINT: single-file temp write + rename. A crash before the
    // rename leaves only the orphaned data dir + tmp file — invisible.
    val md = new Path(manifestDir(dir))
    if (!f.exists(md)) f.mkdirs(md)
    val tmp = new Path(f"${manifestDir(dir)}/.v$v%08d.json.tmp")
    val out = f.create(tmp, false)
    try out.write(render(m).getBytes("UTF-8")) finally out.close()
    val fin = manifestPath(dir, v)
    // lost-race guard: on HDFS the rename itself refuses an existing
    // target; local filesystems overwrite, so the existence check makes
    // the common lost race DETECTED there too (the residual
    // check-then-rename window is the single-writer contract's business)
    if (f.exists(fin) || !f.rename(tmp, fin)) {
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"commit of version $v lost the manifest race (concurrent writer?); " +
          s"data dir $dataDir is orphaned and reclaimable by vacuum")
    }
    v
  }

  /** Maintenance commit: rewrite the LATEST version's data into
    * ~`targetFileBytes` files as a NEW version (operation `compact`).
    * Logical content is identical; readers of prior versions are
    * untouched (their files still exist). */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val cur = read(spark, dir)
    val bytes = {
      val m = manifest(spark, dir, latestVersion(spark, dir).get)
      val f = fs(spark, dir)
      m.files.map(p => f.getFileStatus(new Path(p)).getLen).sum
    }
    val nFiles = math.max(1L, math.ceil(bytes.toDouble / targetFileBytes).toLong)
    commitFiles(spark, dir, "compact") { dataDir =>
      cur.repartition(nFiles.toInt)
        .write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    }
  }

  /** Maintenance commit: [[ZOrder.cluster]] the latest version into a new
    * version (operation `zorder`) — scan locality and time travel in one
    * protocol. */
  def cluster(spark: SparkSession, dir: String, xCol: String, yCol: String,
              nFiles: Int, bits: Int = 16): Long =
    commitFiles(spark, dir, "zorder") { dataDir =>
      ZOrder.cluster(read(spark, dir), xCol, yCol, nFiles, bits)
        .write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    }

  /** Drop versions older than the newest `retain`, then delete every
    * data file (and version directory) no RETAINED manifest references —
    * orphans from torn commits included. Manifest deletion happens
    * FIRST, so a crash mid-vacuum can only strand unreferenced files
    * (re-collected next run), never break a readable version. */
  def vacuum(spark: SparkSession, dir: String, retain: Int = 2): Unit = {
    require(retain >= 1, "must retain at least the latest version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - retain))
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    val referenced = keep.flatMap(v => manifest(spark, dir, v).files).toSet
    val dataRoot = new Path(s"$dir/data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { st =>
        val files = listParquet(spark, st.getPath.toString)
        if (files.forall(p => !referenced.contains(p)))
          f.delete(st.getPath, true) // whole version dir unreferenced
      }
    }
  }

  /** [[graft.operators.CorpusDiff.snapshotDiff]] across two committed
    * versions — the manifest-native form of the snapshot diff. */
  def diffVersions(spark: SparkSession, dir: String, v1: Long, v2: Long,
                   idCol: String, textCol: String): DataFrame =
    graft.operators.CorpusDiff.snapshotDiff(
      readAsOf(spark, dir, v1), readAsOf(spark, dir, v2), idCol, textCol)
}
