package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

/** Keyed last-write-wins state table — the durable-entity analogue
  * (S4 read / S7 upsert; /root/reference/EntityFunctions/EntityFunctions.cs:8-47):
  * `Save` overwrites the value for a key and stamps the write time
  * (EntityFunctions.cs:17-21).
  *
  * Storage: parquet snapshots under `path/v_<n>/`, with `path/_CURRENT`
  * naming the live snapshot — an upsert writes the merged snapshot to v_{n+1}
  * and atomically swaps the pointer, so readers never see a half-written
  * table and the store never reads the directory it is writing (Spark cannot
  * overwrite its own input). State tables are small keyed maps here, but the
  * merge is a distributed union + dedup-to-latest, so the same code holds for
  * billion-key state at cluster scale.
  *
  * Concurrency: every read-merge-write cycle runs inside one lock, so two
  * concurrent `save()` calls serialize and BOTH updates survive (no
  * lost-update window between reading the base snapshot and writing the
  * merge). The last `keepSnapshots` snapshot directories are retained so a
  * lazy DataFrame handed out by `all()` stays evaluable across that many
  * subsequent writes (MVCC-style bounded history; older versions are
  * compacted away).
  */
class KVStore(spark: SparkSession, path: String, keepSnapshots: Int = 3) {
  require(keepSnapshots >= 1, "must retain at least the live snapshot")

  private val root = Paths.get(path)
  private val pointer = root.resolve("_CURRENT")
  Files.createDirectories(root)

  import graft.operators.ChangeFeed

  private def currentVersion: Option[Int] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toInt) else None

  // Files.walk/list return streams that hold an open directory fd until
  // closed — a scheduled cleanup that never closes them exhausts the
  // process's fd table. Always close via try/finally.
  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    val walk = Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }

  private def listDir(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val listing = Files.list(dir)
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      listing.forEach(p => buf += p)
      buf.toSeq
    } finally listing.close()
  }

  /** Full current state: (key string, value string, updated_at timestamp). */
  def all(): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(root.resolve(s"v_$v").toString)
    case None =>
      import spark.implicits._
      Seq.empty[(String, String, Timestamp)].toDF("key", "value", "updated_at")
  }

  /** Point lookup (S4): Some(value) or None, mirroring entity-get-or-204
    * (ClientAllowedColumnsFunction.cs:37-44). */
  def get(key: String): Option[String] =
    all().filter(col("key") === key).select("value")
      .collect().headOption.map(_.getString(0))

  /** Last-write-wins upsert (S7). `now` injectable for deterministic tests. */
  def save(key: String, value: String, now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    import spark.implicits._
    val incoming = Seq((key, value, now)).toDF("key", "value", "updated_at")
    writeMerged(incoming)
  }

  /** Batch upsert of a whole keyed DataFrame (key, value, updated_at). */
  def saveAll(updates: DataFrame): Unit = writeMerged(updates)

  /** Delete a key (entity removal, CleanEntityStorage analogue). */
  def delete(key: String): Unit = synchronized {
    val next = all().filter(col("key") =!= key)
    writeSnapshot(next)
  }

  // Synchronized as a whole: the base snapshot is read INSIDE the lock, so a
  // concurrent save cannot slip between read-merge and write (lost update).
  /** Entity-storage compaction (CleanupFunction.cs:36-40,
    * `CleanEntityStorageAsync { ReleaseOrphanedLocks, RemoveEmptyEntities }`):
    *
    *  - remove-empty-entities → drop keys whose value is null/blank (the
    *    durable-entity "exists but holds no state" shape);
    *  - release-orphaned-locks → delete crash leftovers: stray
    *    `_CURRENT.tmp*` pointer files (a writer died mid-swap) and `v_*`
    *    directories NEWER than the live pointer (a writer died after the
    *    parquet write but before the swap — they are unreachable, not
    *    history).
    *
    * Returns (emptyEntitiesRemoved, orphansDeleted). */
  def cleanStorage(removeEmptyEntities: Boolean = true,
                   releaseOrphanedLocks: Boolean = true): (Long, Long) = synchronized {
    val empties =
      if (!removeEmptyEntities) 0L
      else {
        val current = all()
        val emptyCount = current.filter(col("value").isNull || trim(col("value")) === "").count()
        if (emptyCount > 0) {
          writeSnapshot(current.filter(col("value").isNotNull && trim(col("value")) =!= ""))
        }
        emptyCount
      }
    var orphans = 0L
    if (releaseOrphanedLocks) {
      val live = currentVersion.getOrElse(-1)
      listDir(root).foreach { p =>
        val name = p.getFileName.toString
        val staleTmp = name.startsWith("_CURRENT.tmp")
        val futureSnap = name.startsWith("v_") &&
          name.stripPrefix("v_").toIntOption.exists(_ > live)
        if (staleTmp || futureSnap) {
          deleteRecursively(p)
          orphans += 1
        }
      }
    }
    (empties, orphans)
  }

  private def writeMerged(incoming: DataFrame): Unit = synchronized {
    // union + dedup-to-latest: newest updated_at wins; incoming beats
    // existing on exact timestamp ties (marked by priority column).
    val merged = ChangeFeed.dedupLatest(
      all().withColumn("__pri", lit(0)).unionByName(incoming.withColumn("__pri", lit(1))),
      pk = Seq("key"), version = "updated_at", tieBreak = Seq("__pri"))
      .drop("__pri")
    writeSnapshot(merged)
  }

  private def writeSnapshot(df: DataFrame): Unit = synchronized {
    val next = currentVersion.getOrElse(-1) + 1
    df.write.mode(SaveMode.Overwrite).parquet(root.resolve(s"v_$next").toString)
    val tmp = root.resolve(s"_CURRENT.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // prune snapshots older than the retained window (history compaction,
    // the ContinueAsNew bounded-state analogue — RetryFunctions.cs:60-62);
    // keeping `keepSnapshots` versions keeps recently handed-out lazy
    // readers evaluable instead of failing on a vanished input directory
    (0 to next - keepSnapshots).foreach { v =>
      val dir = root.resolve(s"v_$v")
      if (Files.exists(dir)) deleteRecursively(dir)
    }
  }
}

/** The lease/checkpoint table analogue (S3 scan / S8 conditional rewrite):
  * per-table delivery attempt counts (`[az_func].[lease_*]`,
  * RetryFunctions.cs:137-167). */
class LeaseStore(spark: SparkSession, path: String) {
  private val kv = new KVStore(spark, path)

  def attemptCount(table: String): Option[Int] = kv.get(table).map(_.toInt)

  def setAttemptCount(table: String, n: Int,
                      now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit =
    kv.save(table, n.toString, now)

  /** S8 — the 5→4 nudge that re-arms the trigger's redelivery
    * (RetryFunctions.cs:159-167). Returns true when a nudge happened. */
  def nudgeIfExhausted(table: String,
                       now: Timestamp = new Timestamp(System.currentTimeMillis())): Boolean =
    attemptCount(table) match {
      case Some(5) => setAttemptCount(table, 4, now); true
      case _ => false
    }
}
