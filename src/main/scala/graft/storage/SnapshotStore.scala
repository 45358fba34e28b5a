package graft.storage

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *   <table>/_manifests/v<%08d-version>.json       (the commit log: action deltas)
  *   <table>/_manifests/v<%08d-version>.ckpt.json  (checkpoint HEADER — small)
  *   <table>/_manifests/v<%08d-version>.ckpt/      (checkpoint per-file rows,
  *                                                  multi-part parquet)
  * }}}
  *
  * THE LOG IS INCREMENTAL (round 17 — the Delta/Iceberg action-log
  * model): each commit's log entry records only its ACTION DELTA —
  * added files (with their stats), removed files, and the small header
  * (schema, layout, deletion-vector map) — so commit bytes scale with
  * the CHANGED files, never the table's: a micro-batch append to an
  * 800k-file table writes O(batch files) log bytes, and the log's
  * total footprint is O(Σ changes + checkpoints), not
  * O(commits × table files). The first commit is self-contained, a
  * full-state checkpoint rides every [[CheckpointInterval]]-th commit
  * (best-effort, torn-safe — a corrupt checkpoint is skipped and the
  * replay walks one base further), and vacuum pins a strict checkpoint
  * at the earliest retained version before dropping history, so
  * [[manifest]] reconstructs ANY retained version from at most
  * `CheckpointInterval` small reads.
  *
  * The reconstructed [[Manifest]] lists the FULL data-file set of its
  * version (snapshot isolation — readers hold a closed state), the
  * operation that produced it, and — per data FILE — row count and
  * per-column min/max statistics collected at commit time, which is what
  * lets [[readAsOfWhere]] prune the file list BEFORE the parquet scan
  * (data skipping at file grain — the reader-side payoff of a committed
  * [[cluster]] Z-order/Hilbert layout; Parquet row-group stats only help
  * after a file is already opened). The COMMIT POINT is one atomic
  * put-if-absent of the manifest through the pluggable [[LogStore]]
  * seam (default [[RenameLogStore]]: temp-write + rename — atomic on
  * HDFS and POSIX; S3-class stores plug an external arbiter): data
  * files land first in a version-private directory that no committed
  * manifest references, then the manifest file appears atomically.
  * A crash before the publish strands an orphaned data directory
  * that NO reader can see (torn commits are invisible — spec-proven by
  * killing a commit between the two steps); the next commit of that
  * version RECLAIMS the orphan unattended once it is older than a grace
  * horizon (younger orphans are refused loudly — they may belong to a
  * live writer mid-commit), and vacuum reclaims any stragglers.
  *
  * Readers: [[latestVersion]] = max manifest present; [[readAsOf]] reads
  * the listed files of any retained version — time travel is one
  * manifest read, not a log replay; [[readChangesSince]] is the
  * file-grain change feed (only files ADDED between two versions, with
  * rewrite commits excluded — the storage-layer completion of the CDC
  * story: a downstream consumer follows the log without re-scanning
  * history). Row-grain mutation is COPY-ON-WRITE through the same
  * protocol: [[deleteWhere]] and [[merge]] rewrite only the files whose
  * stats might hold a match / intersect the delta's key envelope and
  * CARRY everything else, and every manifest records the version's
  * UNION schema, so appends/merges may ADD columns (type changes refuse
  * loudly) — pre-evolution files read the new columns as null with zero
  * rewrites. Writers are single-writer by contract (the reference
  * deployment's scheduler discipline); the rename-based commit makes a
  * lost race DETECTABLE (rename onto an existing manifest fails), and a
  * detected loss triggers a BOUNDED optimistic retry at the next free
  * version, so two interleaved committers serialize with both commits
  * landing.
  *
  * Scale shape: a reconstructed state holds one entry per data FILE
  * (not per row) — a 100 TB table at 128 MB files is ~800k entries, a
  * driver-side fold of one checkpoint + ≤[[CheckpointInterval]] deltas;
  * stats collection at commit reads ONLY the stats columns of the
  * NEWLY written files (a column-pruned parquet scan, O(new data), the
  * same cost class as Delta's stats collection); data files never
  * rewrite on commit, so commit cost — data AND log bytes — is
  * O(new files). Maintenance ops
  * ([[compact]], [[cluster]]) rewrite data into NEW version directories
  * and commit — readers of older versions keep their files (nothing is
  * deleted until [[vacuum]] drops versions older than the retention
  * horizon).
  */
object SnapshotStore {

  // Manifests and the checkpoint pointer are engine-internal with a fixed
  // schema; the codec rides Spark's bundled json4s (a real parser —
  // arbitrary path strings, including ']', '"' and '\', round-trip
  // byte-exactly; property-tested in SnapshotStoreSpec). No new
  // dependency: json4s ships in /opt/spark/jars.
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Per-column min/max of one data file. `min`/`max` are None when the
    * file holds no non-null value for the column. Values are Long
    * (integral, date = epoch day, timestamp = epoch micros), Double
    * (fractional), String, or Boolean, keyed by `dataType` (the Spark
    * `simpleString`). `nulls` is the file's exact null count for the
    * column (None on pre-null-count manifests — readers treat absence
    * conservatively), which is what lets `IS NULL` / `IS NOT NULL` —
    * the most common cleaning predicates — prune at file grain. */
  final case class ColStats(dataType: String, min: Option[Any], max: Option[Any],
                            nulls: Option[Long] = None)

  /** Per-file bloom filter of one DECLARED key column (round 16 — the
    * point-lookup answer min/max can't give: `WHERE doc_id = x` on a
    * column the layout isn't sorted by prunes nothing from range stats,
    * but a per-file bloom proves absence for ~99% of files at any
    * layout). `dataType` types the probe-side hash (XxHash64 of the
    * value AT the column's type — hashing 5 as int and as long differ);
    * `b64` is the serialized `org.apache.spark.util.sketch.BloomFilter`,
    * base64. Sized [[BloomNumBits]] bits per (file, column) — 8 KB, ~1%
    * fpp to ~5k distinct values per file, degrading gracefully (a
    * saturated bloom keeps files, never drops them). Only columns the
    * table DECLARES (`bloomCols` — the Delta bloom-index discipline)
    * pay the bytes, and under the round-17 action-delta log each file's
    * bloom is written ONCE (in its add entry) plus once per periodic
    * checkpoint — amortized O(files × 10 KB / CheckpointInterval) log
    * bytes per commit, not a per-commit copy of every bloom. */
  /** ROUND 19 — bloom bytes live in per-commit parquet SIDECARS, not
    * the manifest: `sidecar` points at the commit's hidden `_blooms`
    * parquet dir (inside the same version directory as the files it
    * describes, so vacuum's referenced-file retention covers it for
    * free) and `ord` is the row's index there; `b64` is then empty.
    * The driver-resident [[Manifest]] carries only this pointer — at
    * the format's own 800k-file target that is pointers instead of
    * ~8.5 GB of base64 on EVERY manifest load — and the probe path
    * ([[FilePredicate]] Eq/In atoms) loads bloom bits LAZILY, only for
    * files that already survived min/max + partition pruning (the
    * candidate sliver), one bulk read per touched sidecar, behind a
    * bounded in-JVM LRU. Legacy manifests still carry `b64` inline;
    * an unreadable/dangling sidecar resolves to "no bloom" = keep the
    * file (conservative, never wrong). */
  final case class BloomStats(dataType: String, b64: String,
                              sidecar: Option[String] = None,
                              ord: Long = -1L)

  /** Stats of one data file: exact row count, size in bytes (0 on
    * pre-size manifests — a real parquet file is never 0 bytes, so 0 is
    * a safe absent marker), per-column [[ColStats]], and per-declared-
    * column [[BloomStats]]. Recorded sizes let readers
    * ([[SnapshotFileIndex]], [[compact]]) plan scans without one
    * filesystem RPC per listed file — at ~800k files per 100 TB table,
    * that RPC storm is the difference between a driver-side map lookup
    * and minutes of NameNode round-trips. */
  final case class FileStats(rows: Long, cols: Map[String, ColStats],
                             bytes: Long = 0L,
                             blooms: Map[String, BloomStats] = Map.empty)

  /** `schema` is the version's LOGICAL schema as Spark StructType JSON
    * (None on pre-evolution manifests → readers infer from the files).
    * It is the union of every commit's columns up to this version:
    * data files written before a column existed simply lack it, and the
    * explicit-schema parquet read null-fills — additive schema
    * evolution with zero file rewrites.
    *
    * `partitionCols` — hive-layout partition columns, fixed at the
    * table's first commit (empty = unpartitioned). Partitioned data
    * files elide the partition columns (their values live in the
    * `col=value` path segments, the hive/Delta convention), and every
    * read routes through [[SnapshotFileIndex]], which re-derives the
    * values from the path and surfaces them to Catalyst's PARTITION
    * pruning — a partition predicate prunes the listing before any
    * stats are consulted. */
  /** `ts` — commit wall-clock (epoch millis, recorded at the commit
    * point; 0 on pre-timestamp manifests), serving `TIMESTAMP AS OF`
    * time travel ([[versionAtTimestamp]]). Monotonicity is ENFORCED at
    * the stamp, never assumed of the clock: each commit records
    * `max(now, prior.ts + 1)` (the Delta history-manager
    * monotonization), so an NTP step backwards or cross-host skew
    * between the multi-writer deployments the [[LogStore]] seam targets
    * cannot produce a non-monotone log — which is what lets
    * [[versionAtTimestamp]] and [[vacuumOlderThan]] binary-search on it
    * soundly. */
  /** A data file's DELETION VECTOR reference (round 16 — merge-on-read
    * point deletes, the Delta DV / Iceberg v2 position-delete shape):
    * `path` = the parquet DV file (schema `(file string, pos long)` —
    * one row per deleted PHYSICAL row position, `file` in the
    * `_metadata.file_path` spelling so the read-side anti-join compares
    * same-provenance strings), `rows` = how many of THIS data file's
    * positions it holds. A copy-on-write delete of one row in a 128 MB
    * file costs ~10⁶× write amplification; a DV delete writes O(marked
    * positions) bytes and readers apply the vector — rewrites happen
    * when compaction (or any CoW touch of the file) materializes the
    * deletes away. */
  final case class DvRef(path: String, rows: Long)

  /** `bloomCols` — the table's DECLARED bloom-filter columns (round 16;
    * empty = none). Fixed at layout-defining commits (full-snapshot
    * `commit`), inherited by every carry-style commit, which records a
    * per-file bloom for each declared column over its NEWLY written
    * files.
    *
    * `dvs` — per data file, the [[DvRef]] masking its deleted rows
    * (round 16; absent = the file is fully live). Carried files keep
    * their vectors; any commit that REWRITES a file (CoW delete/update/
    * merge, compaction, clustering) materializes the vector away and
    * drops the entry. */
  /** `droppedCols` — TOMBSTONED physical column names (round 17, `DROP
    * COLUMN`): retained data files may still carry these parquet
    * columns, so a later same-named ADD must take a FRESH physical name
    * (or old bytes would silently resurrect under the new column).
    * Carried forward by every commit; reset by layout-redefining full
    * snapshots (nothing old is referenced). Small by construction: one
    * entry per ever-dropped column. */
  /** `properties` — TABLE PROPERTIES (round 18, the Delta
    * `TBLPROPERTIES` discipline): free-form string pairs riding every
    * manifest header, carried forward by EVERY commit (full snapshots
    * included — a layout redefine does not erase governance knobs),
    * changed only by the explicit property verbs
    * ([[setTableProperties]] / [[unsetTableProperties]] and their SQL
    * faces) or a table-creating commit's declaration. `graft.`-prefixed
    * keys are the engine's own (validated — a typo'd knob refuses
    * loudly, never silently no-ops): `graft.bloomColumns` mirrors the
    * bloom declaration, `graft.checkpointInterval` overrides
    * [[CheckpointInterval]] per table, `graft.constraints.<name>`
    * holds CHECK constraint expression text every write validates.
    * Non-graft keys are opaque user metadata. */
  final case class Manifest(version: Long, operation: String,
                            files: Seq[String],
                            stats: Map[String, FileStats] = Map.empty,
                            schema: Option[String] = None,
                            partitionCols: Seq[String] = Seq.empty,
                            ts: Long = 0L,
                            bloomCols: Seq[String] = Seq.empty,
                            dvs: Map[String, DvRef] = Map.empty,
                            droppedCols: Seq[String] = Seq.empty,
                            properties: Map[String, String] = Map.empty) {
    def schemaStruct: Option[StructType] =
      schema.map(DataType.fromJson(_).asInstanceOf[StructType])
  }

  /** One commit's INCREMENTAL action record (round 17 — the Delta
    * add/remove-action log model): what the version CHANGED, not what it
    * holds. `adds` = files (re)appearing in this version with their
    * commit-time stats, in manifest order; `removes` = prior files the
    * version no longer references. The header fields (schema, layout,
    * dv map) are small and copied whole — reconstruction of any version
    * never depends on walking past its own delta for them. A commit of
    * k new files against an 800k-file table writes O(k) bytes, and the
    * log's total footprint is O(Σ changed files + checkpoints), not
    * O(commits × table files) — the write-side completion of the O(1)
    * `_latest` pointer. */
  private[storage] final case class CommitDelta(
      version: Long, operation: String, ts: Long,
      schema: Option[String], partitionCols: Seq[String],
      bloomCols: Seq[String],
      adds: Seq[(String, Option[FileStats])], removes: Seq[String],
      dvs: Map[String, DvRef], droppedCols: Seq[String] = Seq.empty,
      properties: Map[String, String] = Map.empty)

  /** A full-state CHECKPOINT rides every `CheckpointInterval`-th commit:
    * readers reconstruct `manifest(v)` from the nearest checkpoint (or
    * the self-contained first commit) plus at most `CheckpointInterval`
    * action deltas — never a full log replay. Round 18 moved the
    * encoding to MULTI-PART PARQUET (the Delta `checkpoint.parquet`
    * shape): a small JSON header plus columnar per-file rows under
    * `.ckpt/` — at the format's 800k-file target the legacy
    * single-JSON document was a multi-GB driver-side render/parse every
    * interval-th commit; the parquet form writes and reads distributed,
    * carries bloom bytes as binary, and keeps header bytes independent
    * of file count. Checkpoints are DERIVED data, written best-effort
    * after the commit point and verified at read (a torn/corrupt
    * checkpoint — bad header, missing parts, row-count mismatch — is
    * skipped and the action replay walks one base further back), so
    * they can never break a committed version — only speed it up. */
  val CheckpointInterval: Long = 10L

  /** Operations whose commits rewrite existing rows into new files
    * without changing logical content — excluded from the change feed.
    * `purge` qualifies: the deletions it materializes were ALREADY
    * logical (readers applied the vectors), so the rewrite is
    * content-neutral. */
  val RewriteOps: Set[String] = Set("compact", "zorder", "hilbert", "purge")

  /** The [[RewriteOps]] names are RESERVED for the engine's own
    * content-neutral maintenance rewrites: the change feed, the
    * streaming byte meter and the compaction-source selector all treat
    * them as row-preserving and skip them. A caller-named data commit
    * wearing one of these names would silently vanish from
    * `table_changes` — refuse at the public faces instead. */
  private def reserveRewriteName(operation: String): Unit =
    require(!RewriteOps(operation),
      s"operation name '$operation' is reserved for engine maintenance " +
        "rewrites (content-neutral: excluded from the change feed) — " +
        "pick another name for a data-changing commit")

  /** Engine-staged operations whose lost commit race REFUSES (typed)
    * when the rival removed files or changed deletion vectors, instead
    * of silently re-staging (round 20 — the Delta ConflictChecker
    * discipline): the row-grain DML verbs and the maintenance rewrites.
    * Fixed engine names only — caller-named commits (append/ingest/
    * merge faces) always retry, which the streaming sink's replay
    * contract requires. */
  private[storage] val NonCommutingStagedOps: Set[String] =
    Set("delete", "delete-dv", "update", "update-dv",
      "compact", "zorder", "hilbert", "purge", "restore")

  /** Typed refusal of a lost write-write race ([[NonCommutingStagedOps]]):
    * the staged operation was computed against a state a rival commit
    * replaced. Nothing committed; no partial state remains. */
  final class SnapshotConcurrentModificationException(msg: String)
      extends java.util.ConcurrentModificationException(msg)

  /** Orphaned same-version data dirs younger than this are refused (a
    * live writer may own them); older ones are reclaimed unattended.
    * Single-writer deployments (e.g. streaming ingest restarting after a
    * crash) pass 0 to recover immediately. */
  val DefaultReclaimGraceMs: Long = 10L * 60 * 1000

  private val MaxCommitAttempts = 5

  /** The COMMIT-POINT seam (round 16 — the Delta `LogStore` discipline):
    * everything about a commit is ordinary file I/O EXCEPT the one
    * operation that decides the race — publishing the version's manifest
    * iff no rival already has. That operation's contract is atomic
    * PUT-IF-ABSENT: two concurrent calls for the same path must never
    * both return true. The default [[RenameLogStore]] implements it with
    * temp-write + rename, which honors the contract on HDFS (rename
    * refuses an existing target) and POSIX-local (guarded by the
    * existence check — single-writer-per-host); S3-class object stores
    * have NO atomic rename-if-absent, so a deployment there must plug a
    * store that arbitrates externally (a DynamoDB/CAS table — exactly
    * Delta's S3SingleDriverLogStore lineage) via [[logStore]]. The race
    * spec (`SnapshotStoreSpec`) proves the protocol serializes on the
    * contract ALONE: a mock store over a blind-overwrite filesystem
    * (the object-store failure mode) still never lands two version-N
    * commits. */
  trait LogStore {
    /** Atomically publish `content` at `path` iff absent; true iff THIS
      * call created the file (false = a rival already committed it).
      * May throw on I/O failure — the commit loop treats only `false`
      * as a lost race. */
    def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem, path: Path,
                    content: Array[Byte]): Boolean
  }

  /** temp-write + rename — atomic on HDFS, existence-guarded on local
    * filesystems (where rename overwrites). The temp file is staged
    * exclusively (`create(overwrite = false)`), so two stagers of the
    * SAME version collide loudly there first. */
  object RenameLogStore extends LogStore {
    override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                             path: Path, content: Array[Byte]): Boolean = {
      val tmp = new Path(path.getParent, s".${path.getName}.tmp")
      val out = fs.create(tmp, false) // a rival's staged manifest refuses here
      try out.write(content) finally out.close()
      if (!fs.exists(path) && fs.rename(tmp, path)) true
      else { fs.delete(tmp, false); false }
    }
  }

  /** the pluggable commit arbiter — swap for an object-store-safe
    * implementation when the table lives on S3-class storage */
  @volatile var logStore: LogStore = RenameLogStore

  /** Stats are collected for at most this many leading supported columns
    * (schema order) — the Delta `dataSkippingNumIndexedCols` discipline:
    * commit-time stats cost must not grow with arbitrary table width.
    * Untracked columns simply never prune (conservative). */
  val MaxStatsColumns: Int = 32

  /** String min/max are recorded only for files whose longest value in
    * the column fits this bound — a document-body column would otherwise
    * bloat every manifest entry with kilobyte bounds that never prune
    * anything useful. Dropping the column's stats (not truncating) keeps
    * the bounds EXACT: a truncated max is not an upper bound without a
    * code-point rounding step whose UTF-8/UTF-16 edge cases buy nothing
    * here. Untracked = never prunes = conservative. */
  val MaxStatsStringLen: Int = 64

  /** Per-(file, declared column) bloom size: 2^16 bits = 8 KB — ~1% fpp
    * to ~5k distinct values per file, degrading gracefully above (a
    * saturated bloom keeps files, never drops them; re-[[compact]] to
    * fewer, larger files restores selectivity per byte). Fixed rather
    * than per-file-sized so one distributed aggregation collects every
    * file's bloom in the commit's single stats pass. */
  val BloomNumBits: Long = 1L << 16
  private val BloomEstItems: Long = 4096L

  /** bloom-supported column types — the int/long/string id-column cases
    * point lookups actually hit; the probe side hashes ONLY values it
    * can type losslessly to the same width */
  private def bloomSupported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Typed refusal of a USER-REACHABLE API contract (round 18 —
    * unknown assignment column, no committed version, property
    * violations): the same `AnalysisException` class the SQL face
    * throws, so a programmatic caller catches ONE type whichever door
    * the statement came through. Internal corruption guards (manifest
    * codec) stay `sys.error` — they are never a caller's fault. */
  private[storage] def refuse(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      msg, None, None, None, None, Map.empty[String, String],
      Array.empty[org.apache.spark.QueryContext])

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = s"$dir/_manifests"

  private def manifestPath(dir: String, v: Long) =
    new Path(f"${manifestDir(dir)}/v$v%08d.json")

  // `.ckpt.json` deliberately misses the `v\d{8}\.json` version-listing
  // regex: checkpoints are derived acceleration, never commits. Round 18
  // split the encoding: `.ckpt.json` is now a SMALL header (version,
  // schema, layout, properties — bytes independent of file count) and
  // the per-file rows live as MULTI-PART PARQUET under `.ckpt/` (the
  // Delta `checkpoint.parquet` shape): columnar, compressed, written
  // and read distributed, with bloom bytes as real binary — never one
  // multi-GB JSON document rendered/parsed on the driver. Legacy
  // self-contained `.ckpt.json` checkpoints still read (dispatch on the
  // header's `format` field).
  private def checkpointPath(dir: String, v: Long) =
    new Path(f"${manifestDir(dir)}/v$v%08d.ckpt.json")

  private[storage] def checkpointDataPath(dir: String, v: Long) =
    new Path(f"${manifestDir(dir)}/v$v%08d.ckpt")

  private def checkpointTmpPath(dir: String, v: Long) =
    new Path(f"${manifestDir(dir)}/.v$v%08d.ckpt.tmp")

  /** Rows per parquet checkpoint part — the multi-part split. At the
    * format's own 800k-file target this yields ~16 parts, each bounded
    * (~50k rows; with one declared 8 KB bloom per file ≈ 400 MB before
    * parquet compression) so no single task writes or reads the whole
    * state, and a 1000-executor reader loads the checkpoint with real
    * parallelism. */
  private[storage] val CkptRowsPerPart = 50000

  /** One row per manifest-listed data file. `ord` preserves manifest
    * file order (a parquet read returns parts in any order); `cols` is
    * the per-column stats object in the SAME JSON encoding the action
    * log uses (one codec, property-tested round-trip); bloom bits ride
    * as real BINARY — the base64 blobs existed only because the legacy
    * checkpoint was a text document. Null `rows` marks a file with no
    * stats entry (pre-stats manifests). */
  private[storage] val CkptSchema = StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("bytes", LongType, nullable = true),
    StructField("cols", StringType, nullable = true),
    StructField("bloomCols", ArrayType(StringType, containsNull = false),
      nullable = true),
    StructField("bloomTypes", ArrayType(StringType, containsNull = false),
      nullable = true),
    StructField("bloomBits", ArrayType(BinaryType, containsNull = false),
      nullable = true),
    StructField("dvPath", StringType, nullable = true),
    StructField("dvRows", LongType, nullable = true),
    // round 19 — sidecar POINTERS (per bloom col: path + row ordinal;
    // "" / -1 marks an inline entry riding bloomBits instead). Appended
    // nullable so legacy checkpoints read as all-inline (null-fill).
    StructField("bloomSidecars", ArrayType(StringType, containsNull = false),
      nullable = true),
    StructField("bloomOrds", ArrayType(LongType, containsNull = false),
      nullable = true)))

  private def pointerPath(dir: String) =
    new Path(s"${manifestDir(dir)}/_latest")

  // ---------------------------------------------------- checkpoint pointer

  /** The manifest-log CHECKPOINT (round 15; Delta's `_last_checkpoint`
    * discipline applied to this log): a tiny `_manifests/_latest` file
    * recording the last committed version plus the running max ingest
    * batch id. [[latestVersion]] and the streaming replay guard then
    * cost O(1 + tail) — read the pointer, probe FORWARD for manifests a
    * crashed pointer write missed — instead of a directory listing that
    * grows with commit count (a micro-batch-ingested table accumulates
    * one manifest per trigger; at 100k+ commits the listing storm is
    * the difference between a key lookup and a NameNode scan). The
    * pointer is a HINT, never a correctness input: it is written
    * best-effort AFTER the manifest rename (a crash between leaves a
    * stale pointer the forward probe repairs), it can only lag — never
    * lead — the true latest, and an absent/corrupt/vacuumed-past
    * pointer falls back to the full listing. `maxIngestBatch` = -1
    * when no ingest commit exists. */
  private[storage] final case class Pointer(version: Long, maxIngestBatch: Long)

  private[storage] def readPointer(spark: SparkSession,
                                   dir: String): Option[Pointer] =
    try {
      val p = pointerPath(dir)
      val f = fs(spark, dir)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val root = JsonMethods.parse(json)
        def long(n: String): Long = root \ n match {
          case JLong(l) => l; case JInt(i) => i.toLong
          case other => sys.error(s"pointer missing $n: $other")
        }
        Some(Pointer(long("version"), long("maxIngestBatch")))
      }
    } catch { case scala.util.control.NonFatal(_) =>
      None // torn/corrupt pointer: a hint, so degrade to the full listing
    }

  /** Best-effort overwrite (plain create, not a rename — last writer
    * wins; any torn result is caught by [[readPointer]]'s fallback). */
  private def writePointer(spark: SparkSession, dir: String,
                           p: Pointer): Unit =
    try {
      val out = fs(spark, dir).create(pointerPath(dir), true)
      try out.write(JsonMethods.compact(JsonMethods.render(JObject(
        "version" -> JLong(p.version),
        "maxIngestBatch" -> JLong(p.maxIngestBatch)))).getBytes("UTF-8"))
      finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  private def manifestExists(spark: SparkSession, dir: String,
                             v: Long): Boolean =
    fs(spark, dir).exists(manifestPath(dir, v))

  /** Spec instrumentation: how often reads fell back to the full
    * `_manifests` listing / opened a manifest file — the bounded-reads
    * contract of the checkpoint pointer is asserted on these. */
  private[storage] val fullListingCount = new java.util.concurrent.atomic.AtomicLong
  private[storage] val manifestReadCount = new java.util.concurrent.atomic.AtomicLong

  /** Spec instrumentation: fired at the top of every commit attempt with
    * (operation, claimed version) — lets a spec interleave a RIVAL commit
    * deterministically inside the widest race window (after the version
    * claim, before the manifest rename). No-op outside tests. */
  @volatile private[storage] var onAttemptForTest: (String, Long) => Unit =
    (_, _) => ()

  /** Spec instrumentation: fired before each dropped-zone manifest
    * deletion during [[vacuum]] (descending order) — lets a spec crash
    * the sweep mid-loop and assert every still-listed version stays
    * reconstructable. No-op outside tests. */
  @volatile private[storage] var onVacuumDropForTest: Long => Unit = _ => ()

  private val IngestOp = "ingest-b(\\d+)".r

  /** Max committed `ingest-b<id>` batch id — THE streaming replay
    * guard's load ([[graft.streaming.StreamingSnapshotIngest]]): batch
    * ids are monotonic per checkpoint, so "already committed" is one
    * comparison against this max. Pointer-carried: O(1 + tail) manifest
    * reads on a pointered table (only the tail commits the pointer
    * write missed are opened), one full scan on a legacy table. */
  private[graft] def maxIngestBatchId(spark: SparkSession,
                                      dir: String): Option[Long] = {
    // header-only reads: the operation rides both encodings' top level
    def op(v: Long): Long = commitInfo(spark, dir, v)._1 match {
      case IngestOp(b) => b.toLong
      case _ => -1L
    }
    val m = readPointer(spark, dir) match {
      case Some(p) if manifestExists(spark, dir, p.version) =>
        var acc = p.maxIngestBatch
        var v = p.version + 1
        while (manifestExists(spark, dir, v)) { acc = math.max(acc, op(v)); v += 1 }
        acc
      case _ =>
        versions(spark, dir).foldLeft(-1L)((acc, v) => math.max(acc, op(v)))
    }
    if (m >= 0) Some(m) else None
  }

  // ---------------------------------------------------------------- codec

  private def jValue(v: Any): JValue = v match {
    case l: Long    => JLong(l)
    case d: Double  => JDouble(d)
    case s: String  => JString(s)
    case b: Boolean => JBool(b)
    case other => sys.error(s"unsupported stats value: $other")
  }

  private def anyValue(j: JValue): Any = j match {
    case JLong(l)    => l
    case JInt(i)     => i.toLong
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JString(s)  => s
    case JBool(b)    => b
    case other => sys.error(s"unsupported stats json: $other")
  }

  /** the per-column stats object alone — shared by the log encodings
    * (inside [[fileStatsJson]]) and the PARQUET checkpoint's per-file
    * `cols` cell, so both render byte-identically from one codec */
  private def colsJsonObj(cols: Map[String, ColStats]): JObject =
    JObject(cols.toSeq.sortBy(_._1).map { case (c, cs) =>
      c -> (JObject(
        "t" -> JString(cs.dataType),
        "min" -> cs.min.map(jValue).getOrElse(JNull),
        "max" -> cs.max.map(jValue).getOrElse(JNull),
        "nulls" -> cs.nulls.map(JLong(_)).getOrElse(JNothing)): JValue)
    }.toList)

  private def fileStatsJson(fsx: FileStats): JObject = JObject(
    "rows" -> JLong(fsx.rows),
    "bytes" -> JLong(fsx.bytes),
    "cols" -> colsJsonObj(fsx.cols),
    "blooms" ->
      (if (fsx.blooms.isEmpty) JNothing
       else JObject(fsx.blooms.toSeq.sortBy(_._1).map { case (c, bs) =>
         // sidecar form: a POINTER (path + row ordinal), zero bloom
         // bytes in the log; inline form: the legacy base64 payload
         c -> (bs.sidecar match {
           case Some(sc) => JObject("t" -> JString(bs.dataType),
             "sc" -> JString(sc), "i" -> JLong(bs.ord))
           case None => JObject("t" -> JString(bs.dataType),
             "b" -> JString(bs.b64))
         })
       }.toList)))

  private def dvsJson(dvs: Map[String, DvRef]): JValue =
    if (dvs.isEmpty) JNothing
    else JObject(dvs.toSeq.sortBy(_._1).map { case (f, dv) =>
      f -> JObject("p" -> JString(dv.path), "n" -> JLong(dv.rows))
    }.toList)

  private def headerJson(operation: String, ts: Long, schema: Option[String],
                         partitionCols: Seq[String],
                         bloomCols: Seq[String],
                         droppedCols: Seq[String],
                         properties: Map[String, String]): List[(String, JValue)] = List(
    "operation" -> JString(operation),
    "schema" -> schema.map(JString(_)).getOrElse(JNothing),
    "partitionCols" ->
      (if (partitionCols.isEmpty) JNothing
       else JArray(partitionCols.map(JString(_)).toList)),
    "ts" -> (if (ts == 0L) JNothing else JLong(ts)),
    "bloomCols" ->
      (if (bloomCols.isEmpty) JNothing
       else JArray(bloomCols.map(JString(_)).toList)),
    "droppedCols" ->
      (if (droppedCols.isEmpty) JNothing
       else JArray(droppedCols.map(JString(_)).toList)),
    "properties" ->
      (if (properties.isEmpty) JNothing
       else JObject(properties.toSeq.sortBy(_._1).map { case (k, v) =>
         k -> (JString(v): JValue)
       }.toList)))

  /** the SELF-CONTAINED encoding — first commits, checkpoints, and every
    * pre-round-17 (legacy) manifest */
  private def render(m: Manifest): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      ("version" -> JLong(m.version): (String, JValue)) ::
        ("files" -> (JArray(m.files.map(JString(_)).toList): JValue)) ::
        ("stats" -> (JObject(m.stats.toSeq.sortBy(_._1).map { case (p, fsx) =>
          p -> (fileStatsJson(fsx): JValue)
        }.toList): JValue)) ::
        ("dvs" -> dvsJson(m.dvs)) ::
        headerJson(m.operation, m.ts, m.schema, m.partitionCols, m.bloomCols,
          m.droppedCols, m.properties))))

  /** the ACTION-DELTA encoding (round 17) — every non-first commit.
    * `adds` is an ARRAY (order is the manifest's file order, which a
    * JSON object would lose); each entry carries the file's stats
    * inline, so the change feed and the incremental readers never
    * reconstruct a full manifest just to learn what one commit added. */
  private def renderDelta(d: CommitDelta): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      ("version" -> JLong(d.version): (String, JValue)) ::
        ("adds" -> (JArray(d.adds.map { case (f, st) =>
          JObject(("f" -> (JString(f): JValue)) ::
            st.map(s => "s" -> (fileStatsJson(s): JValue)).toList)
        }.toList): JValue)) ::
        ("removes" ->
          (if (d.removes.isEmpty) JNothing
           else JArray(d.removes.map(JString(_)).toList): JValue)) ::
        ("dvs" -> dvsJson(d.dvs)) ::
        headerJson(d.operation, d.ts, d.schema, d.partitionCols,
          d.bloomCols, d.droppedCols, d.properties))))

  /** inverse of [[colsJsonObj]] — shared by the log decoder and the
    * parquet checkpoint's per-file `cols` cell */
  private def colsOf(jv: JValue): Map[String, ColStats] = jv match {
    case JObject(cf) => cf.map { case (c, cv) =>
      val t = cv \ "t" match { case JString(s) => s
                               case o => sys.error(s"bad col type: $o") }
      def opt(n: String) = cv \ n match {
        case JNull | JNothing => None
        case j => Some(anyValue(j))
      }
      val nulls = cv \ "nulls" match {
        case JLong(l) => Some(l); case JInt(i) => Some(i.toLong)
        case _ => None // pre-null-count manifest
      }
      c -> ColStats(t, opt("min"), opt("max"), nulls)
    }.toMap
    case _ => Map.empty[String, ColStats]
  }

  private def fileStatsOf(fv: JValue): FileStats = {
    val rows = fv \ "rows" match {
      case JLong(l) => l; case JInt(i) => i.toLong
      case o => sys.error(s"bad rows: $o")
    }
    val bytes = fv \ "bytes" match {
      case JLong(l) => l; case JInt(i) => i.toLong
      case _ => 0L // pre-size manifest
    }
    val cols = colsOf(fv \ "cols")
    val blooms = fv \ "blooms" match {
      case JObject(bf) => bf.map { case (c, bv) =>
        val t = bv \ "t" match { case JString(s) => s
                                 case o => sys.error(s"bad bloom type: $o") }
        bv \ "sc" match {
          case JString(sc) =>
            val i = bv \ "i" match {
              case JLong(l) => l; case JInt(n) => n.toLong
              case o => sys.error(s"bad bloom sidecar ord: $o")
            }
            c -> BloomStats(t, "", Some(sc), i)
          case _ =>
            val b = bv \ "b" match { case JString(s) => s
                                     case o => sys.error(s"bad bloom bits: $o") }
            c -> BloomStats(t, b)
        }
      }.toMap
      case _ => Map.empty[String, BloomStats]
    }
    FileStats(rows, cols, bytes, blooms)
  }

  private def dvsOf(root: JValue): Map[String, DvRef] = root \ "dvs" match {
    case JObject(fields) => fields.map { case (f, dv) =>
      val p = dv \ "p" match { case JString(s) => s
                               case o => sys.error(s"bad dv path: $o") }
      val n = dv \ "n" match { case JLong(l) => l; case JInt(i) => i.toLong
                               case o => sys.error(s"bad dv rows: $o") }
      f -> DvRef(p, n)
    }.toMap
    case _ => Map.empty[String, DvRef]
  }

  private def versionOf(root: JValue): Long = root \ "version" match {
    case JLong(l) => l
    case JInt(i)  => i.toLong
    case other    => sys.error(s"manifest missing version: $other")
  }

  private def operationOf(root: JValue): String = root \ "operation" match {
    case JString(s) => s
    case other      => sys.error(s"manifest missing operation: $other")
  }

  private def tsOf(root: JValue): Long = root \ "ts" match {
    case JLong(l) => l; case JInt(i) => i.toLong
    case _ => 0L // pre-timestamp manifest
  }

  private def strArrayOf(root: JValue, n: String): Seq[String] =
    root \ n match {
      case JArray(xs) => xs.map { case JString(s) => s
                                  case o => sys.error(s"bad $n entry: $o") }
      case _ => Seq.empty
    }

  private def schemaFieldOf(root: JValue): Option[String] =
    root \ "schema" match {
      case JString(s) => Some(s)
      case _ => None
    }

  private def propertiesOf(root: JValue): Map[String, String] =
    root \ "properties" match {
      case JObject(fields) => fields.map {
        case (k, JString(v)) => k -> v
        case (k, o) => sys.error(s"bad property $k: $o")
      }.toMap
      case _ => Map.empty
    }

  /** parse the SELF-CONTAINED encoding (legacy manifests, first commits,
    * legacy checkpoints) */
  private[storage] def parse(json: String): Manifest =
    parseManifestRoot(JsonMethods.parse(json))

  private def parseManifestRoot(root: JValue): Manifest = {
    val files = root \ "files" match {
      case JArray(xs) => xs.map { case JString(s) => s
                                  case o => sys.error(s"bad file entry: $o") }
      case other => sys.error(s"manifest missing files: $other")
    }
    val stats = root \ "stats" match {
      case JObject(fields) => fields.map { case (path, fv) =>
        path -> fileStatsOf(fv)
      }.toMap
      case _ => Map.empty[String, FileStats]
    }
    Manifest(versionOf(root), operationOf(root), files, stats,
      schemaFieldOf(root), strArrayOf(root, "partitionCols"), tsOf(root),
      strArrayOf(root, "bloomCols"), dvsOf(root),
      strArrayOf(root, "droppedCols"), propertiesOf(root))
  }

  private def parseDelta(root: JValue): CommitDelta = {
    val adds = root \ "adds" match {
      case JArray(xs) => xs.map { av =>
        val f = av \ "f" match { case JString(s) => s
                                 case o => sys.error(s"bad add entry: $o") }
        val st = av \ "s" match {
          case JNothing | JNull => None
          case sv => Some(fileStatsOf(sv))
        }
        f -> st
      }
      case other => sys.error(s"commit delta missing adds: $other")
    }
    CommitDelta(versionOf(root), operationOf(root), tsOf(root),
      schemaFieldOf(root), strArrayOf(root, "partitionCols"),
      strArrayOf(root, "bloomCols"), adds, strArrayOf(root, "removes"),
      dvsOf(root), strArrayOf(root, "droppedCols"), propertiesOf(root))
  }

  /** Parse either encoding: `files` marks the self-contained form,
    * `adds` the action delta. */
  private[storage] def parseRaw(json: String): Either[Manifest, CommitDelta] = {
    val root = JsonMethods.parse(json)
    root \ "files" match {
      case JArray(_) => Left(parseManifestRoot(root))
      case _ => root \ "adds" match {
        case JArray(_) => Right(parseDelta(root))
        case _ => sys.error("manifest holds neither files nor adds")
      }
    }
  }

  /** Fold one action delta over its predecessor's full state. Carried
    * files keep their (immutable) stats and prior order; adds append in
    * their recorded order; the header fields are the delta's own. */
  private[storage] def applyDelta(prior: Manifest, d: CommitDelta): Manifest = {
    require(d.version == prior.version + 1,
      s"delta v${d.version} cannot apply over v${prior.version} — " +
        "reconstruction must fold contiguous versions")
    val removed = d.removes.toSet
    val addKeys = d.adds.map(_._1).toSet
    val kept = prior.files.filterNot(f => removed(f) || addKeys(f))
    val files = kept ++ d.adds.map(_._1)
    val keptSet = kept.toSet
    val stats = prior.stats.filter(kv => keptSet(kv._1)) ++
      d.adds.flatMap { case (f, st) => st.map(f -> _) }
    Manifest(d.version, d.operation, files, stats, d.schema,
      d.partitionCols, d.ts, d.bloomCols, d.dvs, d.droppedCols,
      d.properties)
  }

  /** The action delta between two consecutive manifests — exactly what
    * [[applyDelta]] inverts: `applyDelta(prior, deltaOf(m, prior))`
    * reproduces `m` up to file ORDER (carried files settle into prior
    * order), which is why the commit loop canonicalizes through this
    * pair before rendering anything. */
  private[storage] def deltaOf(m: Manifest, prior: Manifest): CommitDelta = {
    val priorSet = prior.files.toSet
    val curSet = m.files.toSet
    CommitDelta(m.version, m.operation, m.ts, m.schema, m.partitionCols,
      m.bloomCols,
      adds = m.files.filterNot(priorSet).map(f => f -> m.stats.get(f)),
      removes = prior.files.filterNot(curSet),
      dvs = m.dvs, droppedCols = m.droppedCols, properties = m.properties)
  }

  // round-trip hook for the property spec
  private[storage] def renderForTest(m: Manifest): String = render(m)

  /** Spec hook: write a manifest file directly (no data, no pointer) —
    * lets the bounded-manifest-reads contract be asserted on a
    * 1,000-commit log without paying 1,000 parquet writes. */
  private[storage] def writeManifestForTest(spark: SparkSession, dir: String,
                                            m: Manifest): Unit = {
    val f = fs(spark, dir)
    val md = new Path(manifestDir(dir))
    if (!f.exists(md)) f.mkdirs(md)
    val out = f.create(manifestPath(dir, m.version), false)
    try out.write(render(m).getBytes("UTF-8")) finally out.close()
  }

  private[storage] def writePointerForTest(spark: SparkSession, dir: String,
                                           p: Pointer): Unit =
    writePointer(spark, dir, p)

  // ------------------------------------------------------------- predicates

  /** File-skipping predicate over per-file min/max stats. Evaluated
    * conservatively: a file is pruned ONLY when its stats prove no row
    * can match; missing stats (untracked column, pre-stats manifest)
    * keep the file. [[FilePredicate.toColumn]] derives the equivalent
    * row-level Spark filter, so the pruned read + residual filter is
    * exactly the full scan + filter — one definition, no drift. */
  sealed trait FilePredicate {
    def toColumn: Column
    /** conservative may-match against one file's stats; `br` resolves
      * bloom bits (inline b64, or bits preloaded from sidecars — an
      * unresolvable bloom keeps the file) */
    private[storage] def mightMatch(stats: FileStats,
                                    br: FilePredicate.BloomResolve): Boolean
    /** inline-only evaluation: min/max + any INLINE blooms; sidecar-
      * backed blooms conservatively keep — phase 1 of the lazy-sidecar
      * pruning ([[pruneWithBlooms]] runs phase 2 on the survivors) */
    private[storage] def mightMatch(stats: FileStats): Boolean =
      mightMatch(stats, FilePredicate.InlineResolve)
    /** columns whose Eq/In atoms may consult a bloom — what
      * [[pruneWithBlooms]] prefetches sidecar bits for */
    private[storage] def bloomProbeCols: Set[String] = Set.empty
  }

  object FilePredicate {
    // ordering matches Spark's default binary collation: strings compare
    // as unsigned UTF-8 bytes (java String.compareTo diverges on
    // supplementary characters — UTF-16 surrogates sort below U+E000)
    private def utf8Compare(a: String, b: String): Int = {
      val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }

    private val DecimalTypeRe = """decimal\((\d+),(\d+)\)""".r

    private[storage] def compare(statVal: Any, litVal: Any, t: String): Int =
      (statVal, litVal) match {
        // decimal stats are EXACT unscaled longs at the column's scale
        // (carried in the type string) — re-materialize and compare as
        // BigDecimal, no rounding anywhere
        case (a: Long, b) if t.startsWith("decimal") =>
          val scale = t match {
            case DecimalTypeRe(_, sc) => sc.toInt
            case _ => sys.error(s"malformed decimal stats type $t")
          }
          val bd = b match {
            case d: java.math.BigDecimal => d
            case d: scala.math.BigDecimal => d.bigDecimal
            case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
            case n: Number => new java.math.BigDecimal(n.toString)
            case _ => sys.error(
              s"predicate value $b (${b.getClass.getSimpleName}) is not " +
                s"comparable with $t stats — pass a decimal value")
          }
          java.math.BigDecimal.valueOf(a, scale).compareTo(bd)
        case (a: Long, b: Number)
          if b.isInstanceOf[java.lang.Long] || b.isInstanceOf[Integer] ||
             b.isInstanceOf[java.lang.Short] || b.isInstanceOf[java.lang.Byte] =>
          java.lang.Long.compare(a, b.longValue())
        case (a: Long, b: java.sql.Date) =>
          java.lang.Long.compare(a, b.toLocalDate.toEpochDay)
        case (a: Long, b: java.time.LocalDate) =>
          java.lang.Long.compare(a, b.toEpochDay)
        case (a: Long, b: java.sql.Timestamp) =>
          java.lang.Long.compare(a,
            b.getTime * 1000L + (b.getNanos / 1000L) % 1000L)
        case (a: Long, b: java.time.Instant) =>
          java.lang.Long.compare(a,
            b.getEpochSecond * 1000000L + b.getNano / 1000L)
        case (a: Double, b: Number) => java.lang.Double.compare(a, b.doubleValue())
        case (a: String, b: String) => utf8Compare(a, b)
        case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
        case _ => sys.error(
          s"predicate value $litVal (${litVal.getClass.getSimpleName}) is not " +
            s"comparable with $t stats — pass a value of the column's type")
      }

    private def cmp(col: String, stats: FileStats)
                   (decide: (Int, Int) => Boolean, v: Any): Boolean =
      stats.cols.get(col) match {
        case None => true // column untracked — cannot prune
        case Some(cs) => (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) =>
            decide(compare(mn, v, cs.dataType), compare(mx, v, cs.dataType))
          case _ => false // no non-null value: comparison matches no row
        }
      }

    /** XxHash64 of `v` AT the column's declared type — it must match the
      * write-side hash bit-for-bit (hashing 5 as int and as long give
      * different words), so only loss-free typings hash; anything else
      * skips bloom pruning (None = conservative). */
    private def bloomHash(v: Any, t: String): Option[Long] = {
      import org.apache.spark.sql.catalyst.expressions.{Literal => CLit, XxHash64}
      val typed: Option[CLit] = (v, t) match {
        case (x: Long, "bigint") => Some(CLit(x))
        case (x: Int, "bigint") => Some(CLit(x.toLong))
        case (x: Long, "int") if x.isValidInt => Some(CLit(x.toInt))
        case (x: Int, "int") => Some(CLit(x))
        case (x: String, "string") => Some(CLit(
          org.apache.spark.unsafe.types.UTF8String.fromString(x), StringType))
        case _ => None
      }
      typed.map(l => new XxHash64(Seq(l)).eval(null).asInstanceOf[Long])
    }

    /** Deserialized blooms, weak-keyed by the manifest's own base64
      * String instance: a manifest is parsed once per read and its
      * strings live exactly as long as it does, so each file's bloom
      * decodes ONCE per query (not once per (file, candidate) probe —
      * a 32-value IN over an 800k-file manifest would otherwise pay
      * 25M decodes) and the cache empties with the manifest. */
    private val bloomCache = java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[String,
        org.apache.spark.util.sketch.BloomFilter]())

    private def bloomOf(bs: BloomStats)
        : org.apache.spark.util.sketch.BloomFilter = {
      val got = bloomCache.get(bs.b64)
      if (got != null) got
      else {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(java.util.Base64.getDecoder.decode(bs.b64))
        bloomCache.put(bs.b64, bf)
        bf
      }
    }

    /** Resolves one bloom entry to its decoded filter; None =
      * unavailable (sidecar not loaded / unreadable) → keep the file. */
    private[storage] trait BloomResolve {
      def apply(bs: BloomStats)
          : Option[org.apache.spark.util.sketch.BloomFilter]
    }

    /** inline b64 only — sidecar-backed entries resolve None (keep) */
    private[storage] object InlineResolve extends BloomResolve {
      def apply(bs: BloomStats)
          : Option[org.apache.spark.util.sketch.BloomFilter] =
        if (bs.sidecar.isDefined) None else Some(bloomOf(bs))
    }

    /** inline b64 plus bits PRELOADED from the candidate files'
      * sidecars ([[loadSidecarBlooms]]) */
    private[storage] final class LoadedResolve(
        loaded: Map[(String, Long),
          org.apache.spark.util.sketch.BloomFilter]) extends BloomResolve {
      def apply(bs: BloomStats)
          : Option[org.apache.spark.util.sketch.BloomFilter] =
        bs.sidecar match {
          case Some(sc) => loaded.get((sc, bs.ord))
          case None => Some(bloomOf(bs))
        }
    }

    /** bloom probe of one file's declared-column filter against any of
      * `vs`: definite-absent-for-all prunes; missing bloom / untypeable
      * probes / unresolved sidecar bits keep the file. One decode per
      * file, however many values. */
    private def bloomMightContainAny(s: FileStats, col: String,
                                     vs: Seq[Any], br: BloomResolve): Boolean =
      s.blooms.get(col) match {
        case None => true
        case Some(bs) => br(bs) match {
          case None => true // bits unavailable: conservative keep
          case Some(bf) =>
            vs.exists(v => bloomHash(v, bs.dataType) match {
              case None => true
              case Some(h) => bf.mightContainLong(h)
            })
        }
      }

    final case class EqTo(col: String, value: Any) extends FilePredicate {
      def toColumn: Column = org.apache.spark.sql.functions.col(col) === lit(value)
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        cmp(col, s)((mn, mx) => mn <= 0 && mx >= 0, value) &&
          bloomMightContainAny(s, col, Seq(value), br)
      override private[storage] def bloomProbeCols: Set[String] = Set(col)
    }

    /** `col IN (vs)` — each candidate probes min/max AND the bloom; the
      * file survives iff ANY candidate might be present (the Delta
      * In-pruning shape; bounded lists only — [[SnapshotFileIndex]]
      * translates Catalyst IN up to 32 values). */
    final case class InSet(col: String, values: Seq[Any]) extends FilePredicate {
      def toColumn: Column =
        org.apache.spark.sql.functions.col(col).isin(values: _*)
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean = {
        val rangeHits = values.filter(v =>
          cmp(col, s)((mn, mx) => mn <= 0 && mx >= 0, v))
        rangeHits.nonEmpty && bloomMightContainAny(s, col, rangeHits, br)
      }
      override private[storage] def bloomProbeCols: Set[String] = Set(col)
    }
    final case class GtEq(col: String, value: Any) extends FilePredicate {
      def toColumn: Column = org.apache.spark.sql.functions.col(col) >= lit(value)
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        cmp(col, s)((_, mx) => mx >= 0, value)
    }
    final case class Gt(col: String, value: Any) extends FilePredicate {
      def toColumn: Column = org.apache.spark.sql.functions.col(col) > lit(value)
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        cmp(col, s)((_, mx) => mx > 0, value)
    }
    final case class LtEq(col: String, value: Any) extends FilePredicate {
      def toColumn: Column = org.apache.spark.sql.functions.col(col) <= lit(value)
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        cmp(col, s)((mn, _) => mn <= 0, value)
    }
    final case class Lt(col: String, value: Any) extends FilePredicate {
      def toColumn: Column = org.apache.spark.sql.functions.col(col) < lit(value)
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        cmp(col, s)((mn, _) => mn < 0, value)
    }
    /** Prunes a file whose recorded null count is exactly 0 — the
      * commit-time null counts make `WHERE col IS NULL` a file-grain
      * operation. Untracked columns / pre-null-count manifests keep
      * the file (conservative). */
    final case class IsNull(col: String) extends FilePredicate {
      def toColumn: Column = org.apache.spark.sql.functions.col(col).isNull
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        s.cols.get(col).forall(cs => cs.nulls.forall(_ > 0L))
    }
    /** Prunes a file whose every value in the column is null — `WHERE
      * col IS NOT NULL`, the most common cleaning predicate, skips
      * all-null files. Two independent proofs work: an exact null count
      * equal to the file's row count, or a tracked column with no
      * recorded min/max (only possible when no non-null value exists). */
    final case class IsNotNull(col: String) extends FilePredicate {
      def toColumn: Column = org.apache.spark.sql.functions.col(col).isNotNull
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        s.cols.get(col).forall { cs =>
          // a tracked column records min/max iff a non-null value exists
          !cs.nulls.contains(s.rows) && (cs.min.isDefined || cs.max.isDefined)
        }
    }
    final case class And(l: FilePredicate, r: FilePredicate) extends FilePredicate {
      def toColumn: Column = l.toColumn && r.toColumn
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        l.mightMatch(s, br) && r.mightMatch(s, br)
      override private[storage] def bloomProbeCols: Set[String] =
        l.bloomProbeCols ++ r.bloomProbeCols
    }
    final case class Or(l: FilePredicate, r: FilePredicate) extends FilePredicate {
      def toColumn: Column = l.toColumn || r.toColumn
      private[storage] def mightMatch(s: FileStats, br: BloomResolve): Boolean =
        l.mightMatch(s, br) || r.mightMatch(s, br)
      override private[storage] def bloomProbeCols: Set[String] =
        l.bloomProbeCols ++ r.bloomProbeCols
    }

    /** `lo <= col <= hi` */
    def between(col: String, lo: Any, hi: Any): FilePredicate =
      And(GtEq(col, lo), LtEq(col, hi))
  }

  // ---------------------------------------------------------------- readers

  /** All committed versions, ascending (empty for an uninitialized dir).
    * This is the full O(commit-count) directory listing — maintenance
    * surfaces ([[history]], [[vacuum]]) that genuinely need every
    * version use it; the hot read paths ([[latestVersion]], the
    * streaming guard) ride the checkpoint pointer instead. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    fullListingCount.incrementAndGet()
    val md = new Path(manifestDir(dir))
    val f = fs(spark, dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{8}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  /** Latest committed version — O(1 + pointer lag): read the checkpoint
    * pointer, probe FORWARD for any manifests committed after its write
    * (versions are contiguous by construction, so the first miss is the
    * end). Falls back to the full listing only when the pointer is
    * absent, corrupt, or names a vacuumed manifest. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    readPointer(spark, dir) match {
      case Some(p) if manifestExists(spark, dir, p.version) =>
        var v = p.version
        while (manifestExists(spark, dir, v + 1)) v += 1
        Some(v)
      case _ => versions(spark, dir).lastOption
    }

  private def readText(f: org.apache.hadoop.fs.FileSystem,
                       p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** one committed log entry, whichever encoding it carries */
  private def readRaw(spark: SparkSession, dir: String,
                      version: Long): Either[Manifest, CommitDelta] = {
    manifestReadCount.incrementAndGet()
    val p = manifestPath(dir, version)
    val f = fs(spark, dir)
    require(f.exists(p), s"version $version is not committed at $dir")
    parseRaw(readText(f, p))
  }

  /** The checkpoint of `version`, if present AND readable — checkpoints
    * are derived data written best-effort, so a torn or corrupt one is
    * skipped (the action replay walks to an earlier base), never an
    * error. Two encodings: the round-18 PARQUET form (header names
    * `format: parquet` and its exact row count; the per-file state loads
    * as a columnar scan of the `.ckpt/` parts — a row-count mismatch or
    * unreadable part means a torn data dir and degrades to replay) and
    * the legacy self-contained JSON document. */
  private def readCheckpoint(spark: SparkSession, dir: String,
                             version: Long): Option[Manifest] =
    try {
      val p = checkpointPath(dir, version)
      val f = fs(spark, dir)
      if (!f.exists(p)) None
      else {
        manifestReadCount.incrementAndGet()
        val root = JsonMethods.parse(readText(f, p))
        root \ "format" match {
          case JString("parquet") =>
            if (versionOf(root) != version) None // torn/misplaced header
            else readParquetCheckpoint(spark, dir, version, root)
          case _ =>
            val m = parseManifestRoot(root)
            if (m.version == version) Some(m) else None // torn/misplaced
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** one checkpoint row's bloom entries — sidecar POINTERS when the
    * pointer columns carry one, inline re-encoded base64 otherwise
    * (legacy checkpoints lack the pointer columns entirely) */
  private def ckptRowBlooms(r: org.apache.spark.sql.Row,
                            intern: scala.collection.mutable.HashMap[String, String])
      : Map[String, BloomStats] =
    if (r.isNullAt(5)) Map.empty[String, BloomStats]
    else {
      val bc = r.getSeq[String](5); val bt = r.getSeq[String](6)
      val bb = r.getSeq[Array[Byte]](7)
      val scs = if (r.isNullAt(10)) null else r.getSeq[String](10)
      val ords = if (r.isNullAt(11)) null else r.getSeq[Long](11)
      bc.indices.map { i =>
        val sc = if (scs == null || i >= scs.length) "" else scs(i)
        if (sc.nonEmpty)
          bc(i) -> BloomStats(bt(i), "",
            Some(intern.getOrElseUpdate(sc, sc)), ords(i))
        else bc(i) -> BloomStats(bt(i),
          java.util.Base64.getEncoder.encodeToString(bb(i)))
      }.toMap
    }

  private def readParquetCheckpoint(spark: SparkSession, dir: String,
                                    version: Long,
                                    root: JValue): Option[Manifest] = {
    val entries = root \ "entries" match {
      case JLong(l) => l; case JInt(i) => i.toLong
      case o => sys.error(s"parquet checkpoint header missing entries: $o")
    }
    val dataP = checkpointDataPath(dir, version)
    val f = fs(spark, dir)
    if (!f.exists(dataP)) return None // header landed, data dir torn away
    if (entries < 0L || entries > Int.MaxValue) return None // corrupt header
    // STREAMED per-partition iteration, never one collect(): at the
    // 800k-file target a collect holds every decoded bloom (6+ GB
    // binary) on the driver at once ON TOP of the Manifest being built
    // — here each row's bloom re-encodes to its (model-required) base64
    // form and the row (with its binary) is dropped immediately, so the
    // transient is one row, and file order restores through the `ord`
    // column into a pre-sized array (no sort, no second pass)
    import scala.jdk.CollectionConverters._
    val n = entries.toInt
    val files = new Array[String](n)
    var seen = 0L
    val stats = Map.newBuilder[String, FileStats]
    val dvs = Map.newBuilder[String, DvRef]
    // sidecar paths repeat once per (file, column) of a commit — intern
    // so the reconstructed Manifest holds ONE string instance per
    // sidecar, not 800k copies
    val intern = scala.collection.mutable.HashMap.empty[String, String]
    val it = spark.read.schema(CkptSchema)
      .parquet(dataP.toString).toLocalIterator().asScala
    // the torn-state early exits below abandon the iterator mid-stream;
    // drain it on the way out so the lazily-launched per-partition jobs
    // finish deterministically instead of lingering until GC (torn
    // checkpoints are rare, and the drain is bounded by the data dir)
    try {
    while (it.hasNext) {
      val r = it.next()
      seen += 1
      if (seen > entries) return None // torn data dir (duplicated part)
      val ord = r.getLong(0)
      if (ord < 0L || ord >= n || files(ord.toInt) != null)
        return None // torn data dir (out-of-range or duplicate ord)
      val path = r.getString(1)
      files(ord.toInt) = path
      if (!r.isNullAt(2)) {
        val cols = if (r.isNullAt(4)) Map.empty[String, ColStats]
                   else colsOf(JsonMethods.parse(r.getString(4)))
        stats += path -> FileStats(r.getLong(2), cols, r.getLong(3),
          ckptRowBlooms(r, intern))
      }
      if (!r.isNullAt(8)) dvs += path -> DvRef(r.getString(8), r.getLong(9))
    }
    } finally { while (it.hasNext) it.next() }
    if (seen != entries) return None // torn data dir (missing part)
    Some(Manifest(version, operationOf(root), files.toSeq, stats.result(),
      schemaFieldOf(root), strArrayOf(root, "partitionCols"), tsOf(root),
      strArrayOf(root, "bloomCols"), dvs.result(),
      strArrayOf(root, "droppedCols"), propertiesOf(root)))
  }

  /** Deterministic full-state checkpoint of a committed version, in the
    * MULTI-PART PARQUET encoding: per-file rows land first as parquet
    * parts under a hidden staging dir, publish by rename to `.ckpt/`,
    * and the SMALL header document (`.ckpt.json`) is written LAST — its
    * presence is the checkpoint's commit point, so a crash at any
    * earlier step leaves no readable-but-wrong state (the reader also
    * verifies the header's exact row count against the parts). The
    * file list is never materialized as one JSON string: header bytes
    * are independent of file count, rows are built per file, and the
    * parquet write/read is a distributed columnar job split into
    * [[CkptRowsPerPart]]-row parts. Last-writer-wins overwrite stays
    * safe because every writer of a version renders the same state. */
  /** write-side shape: bloom bytes travel as the manifest's EXISTING
    * base64 strings (row building costs pointers, never a second
    * decoded copy on the driver — at 800k files × 8 KB that copy would
    * be the very multi-GB driver allocation this encoding removes) and
    * decode to binary INSIDE the tasks via `unbase64` */
  private val CkptWriteSchema = StructType(
    CkptSchema.fields.map(f =>
      if (f.name == "bloomBits")
        StructField("bloomB64", ArrayType(StringType, containsNull = false),
          nullable = true)
      else f))

  private def writeCheckpoint(spark: SparkSession, dir: String,
                              m: Manifest): Unit = {
    val f = fs(spark, dir)
    val dataP = checkpointDataPath(dir, m.version)
    val tmp = checkpointTmpPath(dir, m.version)
    if (f.exists(tmp)) {
      // age-gated like orphaned data dirs: a YOUNG staging dir may
      // belong to a live concurrent checkpointer of this version —
      // deleting it from under them could tear the publish
      val age = System.currentTimeMillis() -
        f.getFileStatus(tmp).getModificationTime
      require(age >= DefaultReclaimGraceMs,
        s"$tmp is ${age}ms old (< grace $DefaultReclaimGraceMs ms) — a " +
          "live checkpointer may own it; an older orphan is reclaimed")
      f.delete(tmp, true)
    }
    val rows: Seq[org.apache.spark.sql.Row] =
      m.files.zipWithIndex.map { case (p, i) =>
        val st = m.stats.get(p)
        val dv = m.dvs.get(p)
        val blooms = st.map(_.blooms.toSeq.sortBy(_._1)).getOrElse(Seq.empty)
        org.apache.spark.sql.Row(
          i.toLong, p,
          st.map(s => java.lang.Long.valueOf(s.rows)).orNull,
          st.map(s => java.lang.Long.valueOf(s.bytes)).orNull,
          st.map(s =>
            JsonMethods.compact(JsonMethods.render(colsJsonObj(s.cols))))
            .orNull,
          if (blooms.isEmpty) null else blooms.map(_._1),
          if (blooms.isEmpty) null else blooms.map(_._2.dataType),
          // per entry exactly one of (inline b64, sidecar pointer) is
          // populated — sidecar-backed blooms checkpoint as POINTERS,
          // never re-inlined bits (the whole point of the sidecar)
          if (blooms.isEmpty) null else blooms.map(_._2.b64),
          dv.map(_.path).orNull,
          dv.map(d => java.lang.Long.valueOf(d.rows)).orNull,
          if (blooms.isEmpty) null else blooms.map(_._2.sidecar.getOrElse("")),
          if (blooms.isEmpty) null
          else blooms.map(b => java.lang.Long.valueOf(b._2.ord)))
      }
    val parts = math.max(1, (m.files.size + CkptRowsPerPart - 1) / CkptRowsPerPart)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts), CkptWriteSchema)
      .withColumn("bloomBits", transform(col("bloomB64"), x => unbase64(x)))
      .drop("bloomB64")
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (f.exists(dataP)) f.delete(dataP, true)
    if (!f.rename(tmp, dataP)) {
      // a concurrent checkpointer of the same version won the publish —
      // its bytes encode the same state; ours only clean up
      f.delete(tmp, true)
      if (!f.exists(dataP))
        sys.error(s"checkpoint publish failed for v${m.version} at $dir")
    }
    val hdr = JsonMethods.compact(JsonMethods.render(JObject(
      ("version" -> (JLong(m.version): JValue)) ::
        ("format" -> (JString("parquet"): JValue)) ::
        ("entries" -> (JLong(m.files.size.toLong): JValue)) ::
        // total recorded data bytes (round 20): the lazy SQL relation's
        // sizeInBytes planning hint, derivable without forcing the state
        ("bytes" -> (JLong(m.stats.values.map(_.bytes).sum): JValue)) ::
        headerJson(m.operation, m.ts, m.schema, m.partitionCols,
          m.bloomCols, m.droppedCols, m.properties))))
    val out = f.create(checkpointPath(dir, m.version), true)
    try out.write(hdr.getBytes("UTF-8")) finally out.close()
  }

  // spec seams: exercise both checkpoint encodings + torn states directly
  private[storage] def writeCheckpointForTest(spark: SparkSession,
                                              dir: String,
                                              m: Manifest): Unit =
    writeCheckpoint(spark, dir, m)
  private[storage] def readCheckpointForTest(spark: SparkSession,
                                             dir: String,
                                             version: Long): Option[Manifest] =
    readCheckpoint(spark, dir, version)
  private[storage] def writeLegacyCheckpointForTest(spark: SparkSession,
                                                    dir: String,
                                                    m: Manifest): Unit = {
    val out = fs(spark, dir).create(checkpointPath(dir, m.version), true)
    try out.write(render(m).getBytes("UTF-8")) finally out.close()
  }

  /** HEADER-ONLY read of one commit — (operation, ts) without any state
    * reconstruction: both encodings carry the header at top level, so
    * the timestamp binary searches ([[versionAtTimestamp]],
    * [[vacuumOlderThan]]) and the ingest replay guard cost one small
    * file read per probe, not a checkpoint + delta fold. */
  private[storage] def commitInfo(spark: SparkSession, dir: String,
                                  version: Long): (String, Long) = {
    manifestReadCount.incrementAndGet()
    val p = manifestPath(dir, version)
    val f = fs(spark, dir)
    require(f.exists(p), s"version $version is not committed at $dir")
    val root = JsonMethods.parse(readText(f, p))
    (operationOf(root), tsOf(root))
  }

  /** In-JVM MANIFEST CACHE (round 18 — the Delta Snapshot-cache
    * discipline): a committed (table, version) manifest is immutable —
    * versions are created once and never rewritten (vacuum only
    * deletes) — so reconstruction results are memoizable. Every query
    * over a table reconstructs its latest manifest, and time travel
    * revisits bases, so without a cache each read re-pays the
    * checkpoint load + delta fold (at the 800k-file target, a columnar
    * checkpoint scan per read). Small LRU of SOFT references (the GC
    * reclaims heavyweight manifests under pressure); a hit VALIDATES
    * against the manifest file's current (length, mtime) — a deleted-
    * and-recreated table at the same path (bench reps, test scratch
    * dirs) misses on either signal, and a missing manifest file
    * bypasses the cache entirely so refusal semantics are unchanged.
    * Residual window, stated honestly: a recreate that lands a
    * SAME-LENGTH manifest within the SAME mtime tick could validate —
    * unreachable in practice because a commit writes its data files
    * (many ticks at ms granularity on local/HDFS) before its manifest
    * renames, and deployments on coarser-mtime object stores already
    * plug an external [[LogStore]] arbiter at the same seam. */
  private val ManifestCacheCapacity = 8
  private final case class CachedManifest(len: Long, mtime: Long, m: Manifest)
  private val manifestCache =
    new java.util.LinkedHashMap[(String, Long),
        java.lang.ref.SoftReference[CachedManifest]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long),
            java.lang.ref.SoftReference[CachedManifest]]): Boolean =
        size() > ManifestCacheCapacity
    }

  private[storage] def clearManifestCacheForTest(): Unit =
    manifestCache.synchronized(manifestCache.clear())

  /** The committed manifest of `version` — served from the validated
    * in-JVM cache when possible, else reconstructed from the nearest
    * base at or below it: the version's own checkpoint, else walk back
    * through action deltas to the first checkpoint or self-contained
    * commit and fold forward. Bounded by construction: a base exists
    * every [[CheckpointInterval]] versions (and vacuum pins one at the
    * earliest retained version), so reconstruction reads O(interval)
    * small files — never a log replay. */
  def manifest(spark: SparkSession, dir: String, version: Long): Manifest = {
    val key = (pathKey(dir), version)
    val st = try Some(fs(spark, dir).getFileStatus(manifestPath(dir, version)))
             catch { case _: java.io.IOException => None }
    st.foreach { s0 =>
      manifestCache.synchronized(Option(manifestCache.get(key))) match {
        case Some(ref) => Option(ref.get) match {
          case Some(c) if c.len == s0.getLen &&
              c.mtime == s0.getModificationTime => return c.m
          case _ => manifestCache.synchronized(manifestCache.remove(key))
        }
        case None => ()
      }
    }
    val m = reconstructManifest(spark, dir, version)
    st.foreach(s0 => manifestCache.synchronized(manifestCache.put(key,
      new java.lang.ref.SoftReference(
        CachedManifest(s0.getLen, s0.getModificationTime, m)))))
    m
  }

  private def reconstructManifest(spark: SparkSession, dir: String,
                                  version: Long): Manifest =
    readCheckpoint(spark, dir, version).getOrElse {
      readRaw(spark, dir, version) match {
        case Left(full) => full
        case Right(delta) =>
          var deltas: List[CommitDelta] = delta :: Nil
          var w = version - 1
          var base: Option[Manifest] = None
          while (base.isEmpty) {
            require(w >= 1,
              s"version $version at $dir has no reconstruction base — " +
                "the action log reaches below the first commit (corrupt log)")
            base = readCheckpoint(spark, dir, w)
            if (base.isEmpty) readRaw(spark, dir, w) match {
              case Left(full) => base = Some(full)
              case Right(d) => deltas = d :: deltas; w -= 1
            }
          }
          deltas.foldLeft(base.get)(applyDelta)
      }
    }

  /** The manifests of an ascending version range, at O(range + interval)
    * log reads: reconstruct the first, then fold each following delta
    * forward — the shape [[history]] and [[vacuum]] need (per-version
    * [[manifest]] calls would pay the walk-back once per version). A
    * GAP in the range (the listed state a crash mid-[[vacuum]] leaves:
    * a [1..k] prefix plus the retained suffix) re-bases with one full
    * [[manifest]] reconstruction at the gap — every listed version
    * stays servable, never a refusal until a vacuum re-run. */
  private[storage] def manifestRange(spark: SparkSession, dir: String,
                                     vs: Seq[Long]): Seq[Manifest] = {
    if (vs.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer(
      manifest(spark, dir, vs.head))
    vs.tail.foreach { v =>
      require(v > out.last.version,
        s"manifestRange needs ascending versions, got $v after ${out.last.version}")
      out += (if (v != out.last.version + 1) manifest(spark, dir, v)
      else readRaw(spark, dir, v) match {
        case Left(full) => full
        case Right(d) => applyDelta(out.last, d)
      })
    }
    out.toSeq
  }

  /** the deletion-vector parquet schema: one row per deleted PHYSICAL
    * position, `file` in `_metadata.file_path` spelling */
  private[storage] val DvSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** One parquet reader honoring the manifest's recorded schema when
    * present: files written before a column existed read it as null
    * (additive evolution), and no footer-inference read happens at all
    * (at 800k files, schema certainty should not cost a sample read).
    * PARTITIONED tables route through [[SnapshotFileIndex]] — their data
    * files elide the partition columns, whose values the index re-derives
    * from the hive path segments (files committed by different versions
    * live under different roots, so Spark's own single-basePath discovery
    * can't merge them). Raw form: deletion vectors NOT applied. */
  private def rawReadFiles(spark: SparkSession, dir: String, m: Manifest,
                           files: Seq[String]): DataFrame =
    if (m.partitionCols.nonEmpty)
      SnapshotFileIndex.readFilesOf(spark, dir, m, files)
    else m.schemaStruct match {
      case Some(s) =>
        // files spell PHYSICAL names (column mapping); read physically,
        // alias back to the logical schema — identity when unmapped
        val df = spark.read.schema(toPhysicalSchema(s)).parquet(files: _*)
        // backquoted: a physical name born with a dot (legal via
        // backticks) must resolve as ONE column, not a nested-field
        // path — same quoting as writeData and relationOf
        if (physicalOf(s).isEmpty) df
        else df.select(s.fields.toSeq.map(f =>
          col(s"`${physicalName(f)}`").as(f.name)): _*)
      case None => spark.read.parquet(files: _*)
    }

  /** Apply a manifest's deletion vectors OVER an already-built frame of
    * its files (metadata columns must still resolve on `df`): one
    * broadcast anti-join on the physical row identity, projected back to
    * the frame's own columns. The SQL catalog face uses this (via
    * [[SnapshotDvReadRule]]) where the file-split of [[readFiles]] can't
    * reach — every row pays one bounded hash probe, which a compaction
    * of the vectored files retires. */
  private[storage] def applyDvOverlay(spark: SparkSession, m: Manifest,
                                      df: DataFrame): DataFrame =
    applyDvOverlayDvs(spark, m.dvs, df)

  /** [[rawReadFiles]] with the manifest's DELETION VECTORS applied: files
    * without a vector scan untouched; files WITH one read alongside their
    * `_metadata` row positions and anti-join the (broadcast) vector —
    * the merge-on-read plan shape. DV bytes ∝ deleted positions (point
    * deletes ⇒ tiny broadcast side); the vectored file subset is usually
    * a sliver of the table, so the plan is the plain scan plus one
    * bounded hash-probe stage over that sliver. */
  private[storage] def readFiles(spark: SparkSession, dir: String,
                                 m: Manifest, files: Seq[String]): DataFrame = {
    val dvd = files.filter(m.dvs.contains)
    if (dvd.isEmpty) rawReadFiles(spark, dir, m, files)
    else {
      val clean = files.filterNot(m.dvs.contains)
      val dvFiles = dvd.map(f => m.dvs(f).path).distinct
      val entries = spark.read.schema(DvSchema).parquet(dvFiles: _*)
        .withColumnRenamed("file", "__dv_file")
        .withColumnRenamed("pos", "__dv_pos")
      val live = rawReadFiles(spark, dir, m, dvd)
        .withColumn("__dv_file", col("_metadata.file_path"))
        .withColumn("__dv_pos", col("_metadata.row_index"))
        .join(broadcast(entries), Seq("__dv_file", "__dv_pos"), "left_anti")
        .drop("__dv_file", "__dv_pos")
      if (clean.isEmpty) live
      else rawReadFiles(spark, dir, m, clean).unionByName(live)
    }
  }

  /** Raw hive `col=value` path-segment values of one data file, in
    * `cols` order; the hive null marker decodes to null. Refuses loudly
    * on a file missing a partition segment — the layout invariant every
    * partitioned commit validates before its manifest renames. */
  private[storage] def partitionRawValues(file: String,
                                          cols: Seq[String]): Map[String, String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val kv = new Path(file).toUri.getPath.split('/').iterator.flatMap { s =>
      val i = s.indexOf('=')
      if (i <= 0) Iterator.empty
      else Iterator(ExternalCatalogUtils.unescapePathName(s.substring(0, i)) ->
        ExternalCatalogUtils.unescapePathName(s.substring(i + 1)))
    }.toMap
    cols.map { c =>
      val raw = kv.getOrElse(c, sys.error(
        s"data file $file lacks a hive partition segment for column $c — " +
          "partitioned commits must write partitionBy layouts"))
      c -> (if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null else raw)
    }.toMap
  }

  /** `append = true` is for stages that ALREADY created the version dir
    * themselves (the merge-on-read writers land their hidden `_dv`
    * first) — the exclusive claim on the dir is the commit protocol's
    * orphan-reclaim, not the save mode, so appending into our own
    * freshly-claimed dir is safe. */
  /** `toPhysical` (column mapping): frames arrive in LOGICAL names;
    * data files always spell PHYSICAL — rename at this one choke point
    * so no rewrite path can forget. Partition columns never map
    * (renaming one is refused — their values live in the physical
    * `col=value` layout). */
  private def writeData(df: DataFrame, dataDir: String,
                        partitionCols: Seq[String],
                        append: Boolean = false,
                        toPhysical: Map[String, String] = Map.empty): Unit = {
    // the mapping lookup resolves by the SESSION's case sensitivity —
    // a re-spelled delta column (`Body` for renamed `body`) matches the
    // committed column under case-insensitive analysis, so its physical
    // translation must too, or the file would spell the respelling and
    // every read of it would null-fill the renamed column
    val cs = df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    def phys(c: String): String = toPhysical.collectFirst {
      case (l, p) if (if (cs) l == c else l.equalsIgnoreCase(c)) => p
    }.getOrElse(c)
    val out =
      if (toPhysical.isEmpty) df
      else df.select(df.columns.toSeq.map(c => col(s"`$c`").as(phys(c))): _*)
    val w = out.write.mode(
      if (append) SaveMode.Append else SaveMode.ErrorIfExists)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dataDir)
  }

  /** Read the table as of `version` — one manifest read, then a parquet
    * scan of exactly its files (immutable, so the read is consistent no
    * matter what later commits or maintenance do). Columns appended by
    * schema evolution read as null from files committed before them. */
  def readAsOf(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val m = manifest(spark, dir, version)
    require(m.files.nonEmpty, s"version $version holds no data files")
    readFiles(spark, dir, m, m.files)
  }

  /** The data files of `version` that survive file-skipping under
    * `pred` — the pruning [[readAsOfWhere]] applies, exposed so specs
    * (and operators sizing a scan) can assert the pruned count. */
  def prunedFiles(spark: SparkSession, dir: String, version: Long,
                  pred: FilePredicate): Seq[String] = {
    val m = manifest(spark, dir, version)
    mightMatchFiles(spark, m, Some(pred))
  }

  /** Data-skipping read: prune the version's file list by per-file
    * min/max stats, scan only the survivors, and apply the predicate's
    * row-level form as the residual filter — the result is EXACTLY
    * `readAsOf(version).filter(pred.toColumn)`, at a fraction of the
    * files when the layout clusters the predicate columns (commit via
    * [[cluster]] and the Z-order locality becomes file-grain pruning
    * here). Files without stats are conservatively kept. */
  def readAsOfWhere(spark: SparkSession, dir: String, version: Long,
                    pred: FilePredicate): DataFrame = {
    val m = manifest(spark, dir, version)
    val keep = mightMatchFiles(spark, m, Some(pred))
    if (keep.isEmpty) readAsOf(spark, dir, version).filter(pred.toColumn).limit(0)
    else readFiles(spark, dir, m, keep).filter(pred.toColumn)
  }

  // ------------------------------- distributed (state-as-DataFrame) pruning

  /** instrumentation: (checkpoint entries scanned DISTRIBUTED, file
    * entries materialized on the DRIVER) by the most recent
    * [[prunedFilesDistributed]] / [[readAsOfWhereDistributed]] call on
    * THIS thread — the bounded-driver contract is asserted on the
    * second number (specs and the graded query's in-plan fences read
    * it). PER-THREAD (round 20): concurrent queries (the bench
    * harness, multi-session drivers) must not interleave each other's
    * counters, or an in-plan fence could assert against a rival
    * query's prune. CROSS-THREAD FALLBACK (round 21): a SQL relation's
    * listFiles can run on a Spark planning/broadcast-exchange/AQE pool
    * thread distinct from the one that later reads the fence — a
    * reader whose own thread never ran a prune falls back to the most
    * recent prune process-wide instead of a false (0,0); a thread that
    * DID run one keeps its own latest (no rival interleave). */
  private val lastDistributedPruneTl =
    ThreadLocal.withInitial[Option[(Long, Long)]](() => None)
  @volatile private var lastDistributedPruneGlobal: (Long, Long) = (0L, 0L)
  def lastDistributedPrune: (Long, Long) =
    lastDistributedPruneTl.get().getOrElse(lastDistributedPruneGlobal)
  private def setLastDistributedPrune(v: (Long, Long)): Unit = {
    lastDistributedPruneTl.set(Some(v))
    lastDistributedPruneGlobal = v
  }

  /** executor-side phase-1 row evaluation of one checkpoint entry:
    * min/max / null-count stats only (bloom bits stay in their
    * sidecars; the driver's phase 2 loads them for survivors alone).
    * Absent stats keep the file — conservative, as everywhere. */
  private[storage] def ckptRowMightMatch(r: org.apache.spark.sql.Row,
                                         p: FilePredicate): Boolean =
    r.isNullAt(2) || {
      val cols = if (r.isNullAt(4)) Map.empty[String, ColStats]
                 else colsOf(JsonMethods.parse(r.getString(4)))
      p.mightMatch(FileStats(r.getLong(2), cols,
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    }

  /** The DISTRIBUTED pruning core (round 19 — the Delta Snapshot
    * state-as-DataFrame shape, scoped to READS): evaluate `pred` over
    * the parquet checkpoint's per-file rows AS a Spark job, so the
    * driver materializes ONLY the surviving file entries — never the
    * table's 800k-entry list — plus the small delta tail. Returns None
    * (caller falls back to the in-memory manifest path, same answers)
    * when the version has no parquet-checkpoint base within its delta
    * tail, or the checkpoint fails its torn-state validation.
    *
    * Shape: one column-pruned distributed scan of the `.ckpt/` parts
    * (count/ord validation rides a footer-only aggregate), survivors
    * collected with their stats and bloom POINTERS, the ≤interval tail
    * deltas folded driver-side (O(changed files)), and the shared
    * [[pruneWithBlooms]] phase 2 loads sidecar bits for the candidate
    * sliver only. The result carries a synthetic manifest holding JUST
    * the survivors — [[readFiles]] consumes it as usual (schema,
    * partition layout, and deletion vectors all ride the version's own
    * HEADER, which every log encoding carries whole). */
  private[storage] def distributedPruneState(spark: SparkSession, dir: String,
                                    version: Long, pred: FilePredicate)
      : Option[(Manifest, Seq[String])] = {
    val f = fs(spark, dir)
    // walk back to the nearest PARQUET checkpoint, collecting the tail
    // deltas; a self-contained manifest first = driver-sized already →
    // fall back
    var deltas: List[CommitDelta] = Nil
    var w = version
    var root: Option[JValue] = None
    while (root.isEmpty) {
      val p = checkpointPath(dir, w)
      val r0 =
        if (!f.exists(p)) None
        else try {
          val r = JsonMethods.parse(readText(f, p))
          r \ "format" match {
            case JString("parquet") if versionOf(r) == w => Some(r)
            case _ => None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      r0 match {
        case some @ Some(_) => root = some
        case None =>
          if (w < 1) return None
          readRaw(spark, dir, w) match {
            case Left(_) => return None // self-contained base: fall back
            case Right(d) => deltas = d :: deltas; w -= 1
          }
      }
    }
    val hdr = root.get
    val entries = hdr \ "entries" match {
      case JLong(l) => l; case JInt(i) => i.toLong
      case _ => return None
    }
    val dataP = checkpointDataPath(dir, w)
    if (!f.exists(dataP) || entries < 0L) return None
    // the target version's header fields: the last delta's when a tail
    // exists, else the checkpoint's own. DELETION VECTORS at a
    // checkpoint-COINCIDENT version (empty tail) do NOT ride the parquet
    // checkpoint header — they ride the per-file rows (dvPath/dvRows),
    // so the survivor fold below rebuilds the map from exactly those
    // columns (None here marks that case; survivors-only is sufficient
    // because the synthetic manifest lists only kept files, and
    // readFiles consults dvs only for the files it reads).
    val (op, ts, schemaJ, pCols, bCols, dvsHdr, dropped, props) =
      deltas.lastOption match {
        case Some(d) => (d.operation, d.ts, d.schema, d.partitionCols,
          d.bloomCols, Some(d.dvs), d.droppedCols, d.properties)
        case None => (operationOf(hdr), tsOf(hdr), schemaFieldOf(hdr),
          strArrayOf(hdr, "partitionCols"), strArrayOf(hdr, "bloomCols"),
          None, strArrayOf(hdr, "droppedCols"), propertiesOf(hdr))
      }
    val physPred = toPhysicalPred(pred,
      schemaJ.map(s => physicalOf(DataType.fromJson(s).asInstanceOf[StructType]))
        .getOrElse(Map.empty))
    val df = spark.read.schema(CkptSchema).parquet(dataP.toString)
    // torn-state validation as ONE footer-cheap distributed aggregate:
    // exact row count, distinct in-range ords (a duplicated or missing
    // part cannot pass all four) — mirrors readParquetCheckpoint's
    // streamed checks without materializing anything
    val v = df.agg(count(lit(1)), count_distinct(col("ord")),
      min(col("ord")), max(col("ord"))).head()
    if (v.getLong(0) != entries || v.getLong(1) != entries ||
      (entries > 0L && (v.getLong(2) != 0L || v.getLong(3) != entries - 1L)))
      return None // torn checkpoint → fall back to the replay path
    // PHASE 1, DISTRIBUTED: stats-only evaluation inside the scan
    // tasks; only survivors come back to the driver
    val predLocal = physPred
    val survivorRows = df.rdd.mapPartitions(
      _.filter(r => ckptRowMightMatch(r, predLocal))).collect()
    // the ≤interval tail deltas fold driver-side, mirroring applyDelta:
    // a remove (or re-add) drops the base occurrence; adds append in
    // order with their inline stats
    val baseExclude = scala.collection.mutable.HashSet.empty[String]
    val tail = scala.collection.mutable.LinkedHashMap
      .empty[String, Option[FileStats]]
    deltas.foreach { d =>
      d.removes.foreach { fl => tail.remove(fl); baseExclude += fl }
      d.adds.foreach { case (fl, st) =>
        tail.remove(fl); baseExclude += fl; tail.put(fl, st)
      }
    }
    val intern = scala.collection.mutable.HashMap.empty[String, String]
    val base = survivorRows
      .map(r => (r.getLong(0), r.getString(1), r))
      .sortBy(_._1)
      .collect { case (_, fl, r) if !baseExclude(fl) =>
        fl -> (if (r.isNullAt(2)) None
               else Some(FileStats(r.getLong(2),
                 if (r.isNullAt(4)) Map.empty[String, ColStats]
                 else colsOf(JsonMethods.parse(r.getString(4))),
                 if (r.isNullAt(3)) 0L else r.getLong(3),
                 ckptRowBlooms(r, intern))))
      }.toSeq
    val tailKept = tail.toSeq.filter { case (_, st) =>
      st.forall(physPred.mightMatch)
    }
    val candidates = base ++ tailKept
    // checkpoint-coincident versions: dv refs come from the survivor
    // rows' own dvPath/dvRows columns (fields 8/9 of CkptSchema) —
    // the header never carries them in the parquet encoding
    val dvs = dvsHdr.getOrElse(
      survivorRows.iterator.filter(r => !r.isNullAt(8)).map(r =>
        r.getString(1) -> DvRef(r.getString(8),
          if (r.isNullAt(9)) 0L else r.getLong(9))).toMap)
    setLastDistributedPrune(
      (entries, (survivorRows.length + tail.size).toLong))
    val statsMap = candidates.collect { case (fl, Some(st)) => fl -> st }.toMap
    // PHASE 2: sidecar blooms for the candidate sliver, shared path
    val keep = pruneWithBlooms(spark, candidates.map(_._1), statsMap.get,
      physPred)
    val keepSet = keep.toSet
    Some((Manifest(version, op, keep,
      statsMap.filter(kv => keepSet(kv._1)), schemaJ, pCols, ts, bCols,
      dvs, dropped, props), keep))
  }

  /** ONE commit's HEADER fields without any state reconstruction
    * (round 20): both log encodings carry the full header at top level
    * — schema, layout, deletion vectors, properties — so the lazy SQL
    * relation ([[SnapshotCheckpointFileIndex]]) resolves schema and
    * overlay inputs from one small read, never the file list. */
  private[graft] final case class HeaderInfo(
      version: Long, operation: String, ts: Long, schema: Option[String],
      partitionCols: Seq[String], bloomCols: Seq[String],
      dvs: Map[String, DvRef], droppedCols: Seq[String],
      properties: Map[String, String]) {
    def schemaStruct: Option[StructType] =
      schema.map(DataType.fromJson(_).asInstanceOf[StructType])
    /** header-grain [[Manifest]] view (EMPTY file list) — for code that
      * reads schema/layout/dvs/properties only, never files/stats */
    def lite: Manifest = Manifest(version, operation, Seq.empty, Map.empty,
      schema, partitionCols, ts, bloomCols, dvs, droppedCols, properties)
  }

  private[graft] def headerInfoOf(spark: SparkSession, dir: String,
                                  version: Long): HeaderInfo =
    readRaw(spark, dir, version) match {
      case Right(d) => HeaderInfo(d.version, d.operation, d.ts, d.schema,
        d.partitionCols, d.bloomCols, d.dvs, d.droppedCols, d.properties)
      case Left(m) => HeaderInfo(m.version, m.operation, m.ts, m.schema,
        m.partitionCols, m.bloomCols, m.dvs, m.droppedCols, m.properties)
    }

  /** Does a PARQUET checkpoint (plus an action-delta tail) serve
    * `version`? Returns the total recorded BYTES when derivable from
    * the walk — the base checkpoint header's `bytes` plus the tail
    * adds' (removes are not subtracted: an overestimate only biases
    * planning AWAY from broadcast, never toward a wrong one) — as the
    * lazy relation's `sizeInBytes` hint. `None` = no parquet base
    * within the tail (a self-contained entry bottoms the walk first):
    * the caller uses the driver-resident path. Cost: O(tail) small
    * header/delta reads, the same class as any reconstruction. */
  /** [[parquetCheckpointInfo]] memo — PERFORMANCE-ONLY (round 20): the
    * walk result for a committed (dir, version) can only change in one
    * direction (a checkpoint APPEARING later — vacuum pins one, or the
    * interval writer lands), and the downstream prune re-validates
    * every path it reads, so serving a stale "no checkpoint" merely
    * keeps a table on the driver-resident tier until eviction; a stale
    * "checkpoint at w" whose files were vacuumed falls back inside
    * [[distributedPruneState]]. Bounded LRU, same shape as the
    * manifest cache. */
  private val CkptInfoCacheCapacity = 64
  private val ckptInfoCache =
    new java.util.LinkedHashMap[(String, Long),
        Option[(Long, Option[Long])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long),
            Option[(Long, Option[Long])]]): Boolean =
        size() > CkptInfoCacheCapacity
    }
  private[storage] def clearCkptInfoCacheForTest(): Unit =
    ckptInfoCache.synchronized(ckptInfoCache.clear())

  /** Walk cap: a table whose nearest parquet-checkpoint base lies more
    * than this many deltas back gains little from the lazy tier (the
    * distributed prune would fold the same tail driver-side), and a
    * LEGACY history with no parquet checkpoint at all must not pay an
    * O(commits) walk per relation — beyond the cap the caller uses the
    * driver-resident path. Generous vs the default interval of 10. */
  private val MaxCkptWalk = 64

  /** Minimum checkpoint ENTRY COUNT for the lazy SQL tier (round 20):
    * below it, driver-side materialization of the file list is cheaper
    * than a distributed metadata job per filtered read at ANY deployment
    * scale — small tables keep the round-19 driver-resident relation
    * byte-for-byte. Spec seam: tests drop it to 0 to drive the lazy
    * path on toy tables. */
  @volatile private[storage] var LazyRelationMinEntries: Long = 4096L

  private[graft] def parquetCheckpointInfo(spark: SparkSession, dir: String,
                                           version: Long)
      : Option[(Long, Option[Long])] = {
    val cached = ckptInfoCache.synchronized(
      Option(ckptInfoCache.get((dir, version))))
    cached.foreach(return _)
    val out = parquetCheckpointInfoUncached(spark, dir, version)
    ckptInfoCache.synchronized(ckptInfoCache.put((dir, version), out))
    out
  }

  private def parquetCheckpointInfoUncached(spark: SparkSession, dir: String,
                                            version: Long)
      : Option[(Long, Option[Long])] = {
    val f = fs(spark, dir)
    var w = version
    var addBytes = 0L
    var sawUnsized = false
    var steps = 0
    while (w >= 1 && steps <= MaxCkptWalk) {
      steps += 1
      val p = checkpointPath(dir, w)
      if (f.exists(p)) {
        try {
          val r = JsonMethods.parse(readText(f, p))
          r \ "format" match {
            case JString("parquet") if versionOf(r) == w =>
              if (!f.exists(checkpointDataPath(dir, w))) return None
              val base = r \ "bytes" match {
                case JLong(b) => Some(b)
                case JInt(b) => Some(b.toLong)
                case _ => None // pre-round-20 checkpoint header
              }
              val entries = r \ "entries" match {
                case JLong(n) => n
                case JInt(n) => n.toLong
                case _ => 0L
              }
              return Some((entries,
                if (sawUnsized) None else base.map(_ + addBytes)))
            case _ => ()
          }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      readRaw(spark, dir, w) match {
        case Left(_) => return None
        case Right(d) =>
          val sized = d.adds.flatMap(_._2)
          if (sized.length != d.adds.length || sized.exists(_.bytes <= 0L))
            sawUnsized = true
          addBytes += sized.map(_.bytes).sum
          w -= 1
      }
    }
    None
  }

  /** [[applyDvOverlay]] from a bare deletion-vector map — the header-
    * grain form the lazy SQL relation uses (the manifest variant
    * delegates here). */
  private[storage] def applyDvOverlayDvs(spark: SparkSession,
                                         dvs: Map[String, DvRef],
                                         df: DataFrame): DataFrame =
    if (dvs.isEmpty) df
    else {
      val cols = df.columns.toSeq
      val entries = spark.read.schema(DvSchema)
        .parquet(dvs.values.map(_.path).toSeq.distinct: _*)
        .withColumnRenamed("file", "__dv_file")
        .withColumnRenamed("pos", "__dv_pos")
      df.withColumn("__dv_file", col("_metadata.file_path"))
        .withColumn("__dv_pos", col("_metadata.row_index"))
        .join(broadcast(entries), Seq("__dv_file", "__dv_pos"), "left_anti")
        .select(cols.map(col): _*)
    }

  /** [[prunedFiles]] without materializing the full file list on the
    * driver: the checkpoint is pruned AS a distributed scan and only
    * survivors return (falls back to the in-memory path — same
    * answers — when no parquet checkpoint serves the version). */
  def prunedFilesDistributed(spark: SparkSession, dir: String,
                             version: Long,
                             pred: FilePredicate): Seq[String] =
    distributedPruneState(spark, dir, version, pred) match {
      case Some((_, keep)) => keep
      case None => prunedFiles(spark, dir, version, pred)
    }

  /** [[readAsOfWhere]] through the DISTRIBUTED pruning path: on a
    * parquet-checkpointed table the driver holds only the surviving
    * file entries — the 800k-file point lookup never builds the 800k-
    * entry list. Exactly `readAsOf(version).filter(pred.toColumn)`. */
  def readAsOfWhereDistributed(spark: SparkSession, dir: String,
                               version: Long,
                               pred: FilePredicate): DataFrame =
    distributedPruneState(spark, dir, version, pred) match {
      case Some((m, keep)) if keep.nonEmpty =>
        readFiles(spark, dir, m, keep).filter(pred.toColumn)
      case Some((m, _)) =>
        // provably-empty: an empty frame AT the version's schema
        m.schemaStruct match {
          case Some(s) => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
          case None => readAsOfWhere(spark, dir, version, pred).limit(0)
        }
      case None => readAsOfWhere(spark, dir, version, pred)
    }

  /** Read the latest committed version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAsOf(spark, dir,
      latestVersion(spark, dir)
        .getOrElse(refuse(s"no committed version at $dir")))

  /** Typed refusal of [[versionAtTimestamp]]: the instant precedes every
    * retained commit. Distinct from other failures (pre-timestamp legacy
    * logs, I/O errors) so a caller choosing "start from the beginning"
    * semantics — the streaming source's `startingTimestamp` — can map
    * EXACTLY this case and never mask a genuine error as a full replay. */
  final class NoRetainedVersionAtTimestamp(msg: String)
      extends RuntimeException(msg)

  /** The latest version committed AT OR BEFORE `tsMillis` — `TIMESTAMP
    * AS OF` time travel (Delta's vocabulary). Commit timestamps are
    * MONOTONE under the serialized commit protocol and vacuum drops an
    * oldest PREFIX of the log (manifest existence is monotone too), so
    * both boundaries BINARY-SEARCH: O(log commits) existence probes +
    * manifest reads, never a walk — `TIMESTAMP AS OF <last week>` on a
    * micro-batch table with 100k commits reads ~17 manifests, not tens
    * of thousands (bounded-reads asserted on a 1,000-commit log in
    * `SnapshotCheckpointSpec`). Throws [[NoRetainedVersionAtTimestamp]]
    * when `tsMillis` precedes every retained commit (vacuumed history
    * must not silently serve a later state); refuses loudly when the
    * resolved version is pre-timestamp legacy (ts = 0). */
  def versionAtTimestamp(spark: SparkSession, dir: String,
                         tsMillis: Long): Long = {
    val latest = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    // HEADER-ONLY probes throughout: the binary searches need only ts,
    // which both encodings carry at top level — no state reconstruction
    val tsLatest = commitInfo(spark, dir, latest)._2
    if (tsLatest > 0L && tsLatest <= tsMillis) return latest
    // earliest retained version: existence is monotone over [1, latest]
    var lo = 1L
    var hi = latest
    while (lo < hi) {
      val mid = lo + (hi - lo) / 2
      if (manifestExists(spark, dir, mid)) hi = mid else lo = mid + 1
    }
    val earliest = lo
    // largest version with ts <= tsMillis (ts monotone — ENFORCED at
    // the stamp; legacy ts = 0 entries sort before every real instant,
    // preserving monotonicity)
    var a = earliest
    var b = latest
    var ans = -1L
    var ansTs = 0L
    while (a <= b) {
      val mid = a + (b - a) / 2
      val midTs = commitInfo(spark, dir, mid)._2
      if (midTs <= tsMillis) { ans = mid; ansTs = midTs; a = mid + 1 }
      else b = mid - 1
    }
    if (ans < 0) throw new NoRetainedVersionAtTimestamp(
      s"no retained version at or before timestamp $tsMillis at $dir " +
        s"(earliest retained commit is at ${commitInfo(spark, dir, earliest)._2})")
    require(ansTs > 0L,
      s"version $ans predates commit timestamps — TIMESTAMP AS OF needs " +
        "a timestamped log")
    ans
  }

  /** [[readAsOf]] at a wall-clock instant — `TIMESTAMP AS OF`. */
  def readAsOfTimestamp(spark: SparkSession, dir: String,
                        tsMillis: Long): DataFrame =
    readAsOf(spark, dir, versionAtTimestamp(spark, dir, tsMillis))

  // ------------------------------------------------------------ change feed

  /** The files ADDED by each commit in `(fromVersion, toVersion]`,
    * excluding [[RewriteOps]] commits (compaction/clustering rewrite
    * rows into new files without logical change — surfacing them would
    * re-deliver the whole table). Every version in the range must still
    * be retained (not vacuumed): the per-version delta is computed
    * against its immediate predecessor's manifest. */
  def changedFiles(spark: SparkSession, dir: String,
                   fromVersion: Long, toVersion: Long): Seq[String] = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    // per-version existence probes, NOT a full `_manifests` listing —
    // a streaming consumer calls this every trigger, so the retention
    // check must cost O(range), never O(commit-count)
    (math.max(1L, fromVersion) to toVersion)
      .find(v => !manifestExists(spark, dir, v)).foreach(v => sys.error(
      s"version $v in ($fromVersion, $toVersion] is not retained at $dir — " +
        "the change feed needs every manifest in the range"))
    (fromVersion + 1 to toVersion).flatMap { v =>
      // the action-delta encoding answers "what did v add" in ONE small
      // read; only legacy self-contained entries still diff against the
      // predecessor's reconstructed state
      readRaw(spark, dir, v) match {
        case Right(d) =>
          if (RewriteOps(d.operation)) Seq.empty else d.adds.map(_._1)
        case Left(m) =>
          if (RewriteOps(m.operation)) Seq.empty
          else {
            val prev: Set[String] =
              if (v - 1 >= 1) manifest(spark, dir, v - 1).files.toSet
              else Set.empty
            m.files.filterNot(prev)
          }
      }
    }
  }

  /** File-grain CDC read: the rows added between two committed versions
    * (`(fromVersion, toVersion]`), delivered by scanning ONLY the files
    * those commits added — a downstream consumer of
    * [[graft.streaming.StreamingSnapshotIngest]] follows the table
    * incrementally without ever re-scanning history (the storage-layer
    * mirror of the reference's high-water-mark-bounded delivery,
    * README.md:19-23). Append-grain: full-snapshot `commit`s surface
    * their newly written files; rewrite commits surface nothing; row
    * deletions are not represented (this is an ADD feed — the snapshot
    * diff [[diffVersions]] is the row-grain form). */
  def readChangesSince(spark: SparkSession, dir: String,
                       fromVersion: Long, toVersion: Long): DataFrame = {
    val files = changedFiles(spark, dir, fromVersion, toVersion)
    if (files.isEmpty) readAsOf(spark, dir, toVersion).limit(0)
    else readFiles(spark, dir, manifest(spark, dir, toVersion), files)
  }

  /** [[readChangesSince]] with data skipping: the added-file list is
    * further pruned by each commit's per-file stats before the scan,
    * and the predicate's row form applies as the residual filter — an
    * incremental consumer that only wants a slice (one language, one id
    * range) touches neither history NOR the off-slice files of the new
    * commits. Exactly `readChangesSince(..).filter(pred.toColumn)`. */
  def readChangesSinceWhere(spark: SparkSession, dir: String,
                            fromVersion: Long, toVersion: Long,
                            pred: FilePredicate): DataFrame = {
    val files = changedFiles(spark, dir, fromVersion, toVersion)
    // stats live in each file's OWN commit entry; toVersion's state
    // carries them forward for append chains, but rewrite interleavings
    // can drop carried stats, so consult the whole range — one small
    // read per version (the delta's adds carry their stats inline)
    val stats = (math.max(1L, fromVersion) to toVersion)
      .flatMap(v => readRaw(spark, dir, v) match {
        case Right(d) => d.adds.flatMap { case (f, st) => st.map(f -> _) }
        case Left(m) => m.stats.toSeq
      }).toMap
    val toM = manifest(spark, dir, toVersion)
    val physPred = toPhysicalPred(pred, mappingOf(toM))
    val keep = pruneWithBlooms(spark, files, stats.get, physPred)
    if (keep.isEmpty) readAsOf(spark, dir, toVersion)
      .filter(pred.toColumn).limit(0)
    else readFiles(spark, dir, manifest(spark, dir, toVersion), keep)
      .filter(pred.toColumn)
  }

  // ---------------------------------------------------------------- writers

  /** Commit `df` as the next version (full-snapshot semantics: the new
    * version IS `df`). Data lands in a version-private directory first;
    * the version exists only once the manifest rename succeeds — the one
    * atomic step. `partitionBy` fixes the table's hive partition layout
    * (a full snapshot may also CHANGE it — nothing carries); partition
    * columns are elided from the data files and recorded in the
    * manifest, so partition pruning fires before stats pruning on every
    * read. Returns the committed version. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
             operation: String,
             reclaimGraceMs: Long = DefaultReclaimGraceMs,
             partitionBy: Seq[String] = Seq.empty,
             bloomCols: Seq[String] = Seq.empty,
             tblProperties: Map[String, String] = Map.empty): Long = {
    reserveRewriteName(operation)
    // identity high-water updates flow from the stage (which allocates)
    // into the SAME commit's property map — set per attempt, read by
    // propertiesFn strictly after (the commit loop's stage-then-props
    // order), so a lost race re-allocates against the rival's water
    val hwUpdates = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, String])
    commitStagedFull(spark, dir, operation, reclaimGraceMs,
      partitionBy = Some(partitionBy),
      // the WRITING frame's partition column types are authoritative —
      // hive path inference would re-type (long 0..3 reads back int) and
      // a later append's in-memory type would then spuriously conflict
      partitionTypeHint = partitionBy.flatMap(c =>
        df.schema.fields.find(_.name.equalsIgnoreCase(c))
          .map(f => c -> f.dataType)).toMap,
      bloomColsOpt = Some(bloomCols),
      // a full snapshot REDEFINES the schema: the frame's own names are
      // the authority (no resurrected column mapping — see the flag doc),
      // and no old file is referenced, so the tombstones reset too
      freshArePhysical = false,
      droppedColsFn = Some(_ => Seq.empty),
      // declared table properties MERGE over the carried map (a
      // table-creating commit simply sets them); omitted = carry
      propertiesFn = Some(p => p.map(_.properties).getOrElse(Map.empty) ++
        validatedProperties(tblProperties) ++ hwUpdates.get())) {
      (prior0, dataDir) =>
      val props = prior0.map(_.properties).getOrElse(Map.empty) ++
        validatedProperties(tblProperties)
      val (withIds, hw) = applyIdentity(spark, df, props)
      hwUpdates.set(hw)
      // expression defaults: carried declarations plus this commit's own
      try writeData(applyColumnDefaults(spark, withIds, generatedOf(props)),
        dataDir, partitionBy)
      finally releaseIdentityPin()
      Staged(Seq.empty, Map.empty)
    }
  }

  /** APPEND commit: the new version = previous version's file set plus
    * `delta`'s files — only the delta's bytes are written (the Delta-style
    * incremental ingest shape: commit cost O(new files), history never
    * rewritten). A partitioned table's layout is INHERITED — the delta
    * lands under the same `col=value` directories. With no prior version
    * this is [[commit]]. */
  def commitAppend(spark: SparkSession, dir: String, delta: DataFrame,
                   operation: String,
                   reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    reserveRewriteName(operation)
    preValidateEvolution(spark, dir, delta)
    // identity allocation per attempt; the high-water update rides the
    // same commit's property map (see [[commit]])
    val hwUpdates = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, String])
    // BOUNDED stage (round 20): everything this closure reads rides the
    // prior's HEADER — the commit loop renders the adds-only delta
    // directly and the prior file list never materializes driver-side
    commitStagedFull(spark, dir, operation, reclaimGraceMs,
      propertiesFn = Some(p => p.map(_.properties).getOrElse(Map.empty) ++
        hwUpdates.get()),
      stageBounded = Some { (hdr, dataDir) =>
        val props = hdr.map(_.properties).getOrElse(Map.empty)
        val (withIds, hw) = applyIdentity(spark, delta, props)
        hwUpdates.set(hw)
        try writeData(
          applyColumnDefaults(spark, withIds, generatedOf(props)),
          dataDir,
          hdr.map(_.partitionCols).getOrElse(Seq.empty),
          toPhysical = hdr.flatMap(_.schemaStruct).map(physicalOf)
            .getOrElse(Map.empty))
        finally releaseIdentityPin()
        Staged(Seq.empty, Map.empty)
      }) { (_, _) => sys.error("unreachable: bounded stage set") }
  }

  /** Fail a detectable schema-evolution conflict BEFORE any data is
    * written (no wasted delta write, no staged dir to reclaim). The
    * commit loop re-validates authoritatively against the prior manifest
    * it actually carries from — this is the cheap early exit, not the
    * gate. */
  private def caseSensitive(spark: SparkSession): Boolean =
    spark.sessionState.conf.caseSensitiveAnalysis

  private def preValidateEvolution(spark: SparkSession, dir: String,
                                   delta: DataFrame): Unit =
    // header-only (round 20): the early exit needs schema + tombstones,
    // never the file list
    latestVersion(spark, dir).map(v => headerInfoOf(spark, dir, v))
      .foreach(h => h.schemaStruct.foreach(s => mergeSchemas(s, delta.schema,
        caseSensitive(spark), h.droppedCols.toSet)))

  /** Copy-on-write row DELETE: commit a new version (operation `delete`)
    * holding the latest version minus the rows where `pred` is TRUE
    * (SQL DELETE semantics — null-predicate rows survive). The per-file
    * stats prune the WRITE side exactly as they prune reads: only files
    * that MIGHT hold a matching row are rewritten (minus their matches);
    * every provably-clean file is CARRIED into the new version untouched,
    * stats and all — so on a clustered layout a narrow delete rewrites a
    * handful of files out of the table's ~800k, and the commit stays
    * O(touched bytes), never O(table). A delete the stats prove matches
    * nothing commits NO new version (returns the current one). Readers of
    * prior versions keep every file (nothing is deleted until [[vacuum]]);
    * the change feed surfaces the rewritten files (the standard
    * copy-on-write CDC grain: surviving rows of a touched file
    * re-deliver alongside the actual change).
    *
    * Deleting EVERY row is refused loudly (a committed version always
    * holds at least one data file) — drop the table dir instead. */
  def deleteWhere(spark: SparkSession, dir: String, pred: FilePredicate,
                  reclaimGraceMs: Long = DefaultReclaimGraceMs): Long =
    deleteCondition(spark, dir, pred.toColumn, Some(pred), reclaimGraceMs)

  /** [[deleteWhere]] generalized to an ARBITRARY row condition — the SQL
    * `DELETE FROM` front door ([[graft.plans.SnapshotDml]]): `prune`
    * (when the condition translates to stats atoms) carries every
    * provably-clean file; the row condition decides inside the rewritten
    * files. With no translatable prune every file rewrites (correct,
    * just not O(touched)). Same null-keeps SQL DELETE semantics, same
    * no-op short-circuit when the stats prove nothing matches. */
  private[graft] def deleteCondition(spark: SparkSession, dir: String,
                                     rowCond: Column,
                                     prune: Option[FilePredicate],
                                     reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    prune.foreach { p =>
      if (prunedFilesBounded(spark, dir, cur, p).isEmpty)
        return cur // stats prove no row matches: nothing to rewrite
    }
    // BOUNDED stage (round 20): touched selection through the
    // distributed prune; the untouched list never materializes — the
    // commit renders (adds = rewrites, removes = touched) directly
    commitStagedFull(spark, dir, "delete", reclaimGraceMs,
      stageBounded = Some { (hdrOpt, dataDir) =>
        val h = hdrOpt.getOrElse(refuse(s"no committed version at $dir"))
        val (mView, touched) = dvMutationView(spark, dir, h.version, prune)
        if (touched.nonEmpty)
          writeData(readFiles(spark, dir, mView, touched)
            // keep rows where the condition is NOT TRUE (null keeps, as SQL)
            .filter(!coalesce(rowCond, lit(false))), dataDir,
            mView.partitionCols, toPhysical = mappingOf(mView))
        Staged(Seq.empty, Map.empty, removes = touched)
      }) { (_, _) => sys.error("unreachable: bounded stage set") }
  }

  /** Marked-row fraction at or below which [[deleteConditionAuto]] picks
    * the deletion-vector path: a narrow delete writes O(marks) vector
    * bytes; past the threshold the vector would mask a meaningful slice
    * of every touched file — each read then pays a probe per row for
    * little byte savings, and copy-on-write is the better trade. 5% is
    * the Delta-ish operating point. */
  val DvAutoThreshold: Double = 0.05

  /** Measured AUTO-dispatch between the DV and CoW delete paths — the
    * SQL `DELETE FROM` route: one counting scan of the stats-pruned
    * touched files decides (marked == 0 → no commit at all, a STRONGER
    * short-circuit than the stats-only one; marked ≤ [[DvAutoThreshold]]
    * of touched rows → [[deleteConditionDv]]; else [[deleteCondition]]).
    * The count costs one column-pruned read of the touched files — the
    * same cost class as either path's own read — and buys point deletes
    * their O(marks) write instead of a 128 MB-per-row rewrite. */
  private[graft] def deleteConditionAuto(spark: SparkSession, dir: String,
                                         rowCond: Column,
                                         prune: Option[FilePredicate],
                                         reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    // the dispatch measurement itself is BOUNDED (round 20): the
    // survivors view carries exactly the touched files' stats + dvs
    val (m, touched) = dvMutationView(spark, dir, cur, prune)
    if (touched.isEmpty) return cur
    val marked = readFiles(spark, dir, m, touched)
      .filter(coalesce(rowCond, lit(false))).count()
    if (marked == 0L) return cur
    // a touched file without row stats (legacy pre-stats manifest)
    // makes the marked fraction unmeasurable — fall back to
    // copy-on-write (correct at any width) rather than guess: a
    // substituted ceiling would drive marked/total towards 0 and route
    // even a delete-everything onto the vector path, where every later
    // read pays a probe per row for no byte savings
    val statless = touched.exists(f => !m.stats.contains(f))
    val total = math.max(1L, touched.flatMap(m.stats.get).map(_.rows).sum -
      touched.flatMap(m.dvs.get).map(_.rows).sum)
    if (!statless && marked.toDouble / total <= DvAutoThreshold)
      deleteConditionDv(spark, dir, rowCond, prune, reclaimGraceMs)
    else deleteCondition(spark, dir, rowCond, prune, reclaimGraceMs)
  }

  /** MERGE-ON-READ row DELETE (round 16 — deletion vectors): instead of
    * rewriting every file that might hold a match ([[deleteWhere]]'s
    * copy-on-write), commit a new version whose data files are ALL
    * CARRIED and whose touched files gain a [[DvRef]] masking the
    * matched PHYSICAL row positions. A 1-row delete in a 128 MB file
    * writes O(marked positions) bytes, not O(file) — the write-
    * amplification fix for point deletes (write-amp spec fenced in
    * `SnapshotDvSpec`). Readers ([[readFiles]] and every face above it,
    * including [[readRowChanges]]' CDF derivation) apply vectors via a
    * broadcast anti-join on `(_metadata.file_path, _metadata.row_index)`;
    * any later rewrite of a vectored file — [[compact]], [[cluster]],
    * CoW [[deleteWhere]]/[[merge]]/[[updateCondition]] — reads it
    * vector-applied and MATERIALIZES the deletes away. Chained DV
    * deletes fold: the new vector carries the touched files' prior
    * entries, so each file references exactly ONE vector file. Same SQL
    * DELETE semantics as the CoW path (null-condition rows survive);
    * same stats-driven write-side skipping (only might-match files are
    * even scanned); a provably-no-match delete commits nothing. Prefer
    * this for narrow deletes and [[deleteWhere]] for wide ones (a
    * vector masking most of a file costs a probe per row at every read
    * until compaction). */
  def deleteWhereDv(spark: SparkSession, dir: String, pred: FilePredicate,
                    reclaimGraceMs: Long = DefaultReclaimGraceMs): Long =
    deleteConditionDv(spark, dir, pred.toColumn, Some(pred), reclaimGraceMs)

  /** [[deleteWhereDv]] generalized to an arbitrary row condition (the
    * SQL front door's shape, mirroring [[deleteCondition]]). */
  private[graft] def deleteConditionDv(spark: SparkSession, dir: String,
                                       rowCond: Column,
                                       prune: Option[FilePredicate],
                                       reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    prune.foreach { p =>
      if (prunedFilesBounded(spark, dir, cur, p).isEmpty)
        return cur // stats prove no row matches: nothing to mark
    }
    // BOUNDED stage (round 20): the touched set comes from the
    // distributed prune (survivors-only driver residency on a
    // checkpointed table), the header's dv map carries whole, and the
    // commit renders an adds-empty delta with the folded vectors —
    // the prior file list never materializes on a narrow delete
    commitStagedFull(spark, dir, "delete-dv", reclaimGraceMs,
      stageBounded = Some { (hdrOpt, dataDir) =>
        val h = hdrOpt.getOrElse(refuse(s"no committed version at $dir"))
        val (mView, touched) = dvMutationView(spark, dir, h.version, prune)
        // the DvRef path is recorded fs-QUALIFIED: a relative table dir
        // would otherwise record a relative vector path that vacuum's
        // qualified-listing prefix check could never match — and the
        // version dir of a DV-only commit (no data files) would be
        // reclaimed out from under the retained manifest's vector
        val newDvDir = fs(spark, dir)
          .makeQualified(new Path(s"$dataDir/_dv")).toString
        val countsByKey: Map[String, DvRef] =
          if (touched.isEmpty) Map.empty
          else {
            val live = liveWithProvenance(spark, dir, mView, touched)
            writeFoldedVector(spark, mView, touched,
              live.filter(coalesce(rowCond, lit(false)))
                .select(col("__dv_file").as("file"),
                  col("__dv_pos").as("pos")), newDvDir)
          }
        val updated = boundedDvFold(h.dvs, touched, countsByKey)
        // a delete that would mask EVERY live row is refused like the
        // copy-on-write path refuses it (a committed version holds at
        // least one data file with live rows) — committing it would
        // wedge the table: purgeVectors and compact rewrite to zero
        // files and cannot commit, so the all-masking vector could
        // never retire. Cheap proof first: ANY touched row surviving
        // the condition keeps the table live; only the all-masked
        // corner pays the full-state arithmetic.
        if (countsByKey.nonEmpty) {
          val survivor = liveWithProvenance(spark, dir, mView, touched)
            .filter(!coalesce(rowCond, lit(false))).limit(1).count()
          if (survivor == 0L) {
            val mFull = manifest(spark, dir, h.version)
            if (mFull.files.forall(mFull.stats.contains)) {
              val physical = mFull.files.map(f => mFull.stats(f).rows).sum
              val masked = mFull.files.flatMap(updated.get).map(_.rows).sum
              require(masked < physical,
                s"delete would mask every live row of $dir — deleting the " +
                  "whole table is refused (drop the table directory instead)")
            }
          }
        }
        Staged(Seq.empty, Map.empty, Some(updated))
      }) { (_, _) => sys.error("unreachable: bounded stage set") }
  }

  /** BOUNDED working state of a predicate-scoped mutation (round 20 —
    * the commit-side extension of the distributed pruning tier): the
    * touched-file selection runs INSIDE a distributed checkpoint scan
    * and the returned manifest view lists the SURVIVORS ONLY (with
    * their stats; header fields — schema, layout, the full dv map —
    * ride whole), so a narrow DV mutation against an 800k-file table
    * never materializes the table's file list. Falls back to the full
    * reconstruction when no parquet checkpoint serves the version or
    * the predicate is untranslatable (every file must be consulted
    * anyway) — same answers either way. */
  private def dvMutationView(spark: SparkSession, dir: String,
                             version: Long, prune: Option[FilePredicate])
      : (Manifest, Seq[String]) =
    prune.filter(_ => lazyTierServes(spark, dir, version))
      .flatMap(p => distributedPruneState(spark, dir, version, p)) match {
      case Some((mSurv, keep)) => (mSurv, keep)
      case None =>
        val m = manifest(spark, dir, version)
        (m, mightMatchFiles(spark, m, prune))
    }

  /** is the DISTRIBUTED metadata tier worth it for this version? —
    * a parquet checkpoint serves it AND the state is large enough that
    * driver materialization is the real cost (below
    * [[LazyRelationMinEntries]] the driver path wins at any scale) */
  private[storage] def lazyTierServes(spark: SparkSession, dir: String,
                                      version: Long): Boolean =
    parquetCheckpointInfo(spark, dir, version)
      .exists(_._1 >= LazyRelationMinEntries)

  /** [[prunedFiles]] through the scale-appropriate tier: distributed on
    * large checkpointed states, driver-resident otherwise — the write
    * faces' early-exit probe. */
  private[storage] def prunedFilesBounded(spark: SparkSession, dir: String,
                                          version: Long,
                                          pred: FilePredicate): Seq[String] =
    if (lazyTierServes(spark, dir, version))
      prunedFilesDistributed(spark, dir, version, pred)
    else prunedFiles(spark, dir, version, pred)

  /** the mutated DV map of a BOUNDED merge-on-read commit: every prior
    * ref carries (the header map rides whole); touched files with fresh
    * marks point at their new bucket */
  private def boundedDvFold(headerDvs: Map[String, DvRef],
                            touched: Seq[String],
                            refsByKey: Map[String, DvRef]): Map[String, DvRef] =
    headerDvs ++ touched.flatMap(f => refsByKey.get(pathKey(f)).map(f -> _))

  /** LIVE rows of `touched` files with their physical provenance as
    * ordinary columns (`__dv_file`, `__dv_pos`): metadata materializes
    * BEFORE any join so provenance stays the scanned file's, and the
    * files' prior vectors are applied by the standard broadcast
    * anti-join — the shared front half of every merge-on-read WRITE
    * (DV delete / update / merge). */
  private def liveWithProvenance(spark: SparkSession, dir: String,
                                 m: Manifest,
                                 touched: Seq[String]): DataFrame = {
    val withMeta = rawReadFiles(spark, dir, m, touched)
      .withColumn("__dv_file", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
    val oldDvFiles = touched.flatMap(f => m.dvs.get(f).map(_.path)).distinct
    if (oldDvFiles.isEmpty) withMeta
    else withMeta.join(broadcast(spark.read.schema(DvSchema)
      .parquet(oldDvFiles: _*)
      .withColumnRenamed("file", "__dv_file")
      .withColumnRenamed("pos", "__dv_pos")),
      Seq("__dv_file", "__dv_pos"), "left_anti")
  }

  /** Max parallel bucket files of one commit's deletion-vector write —
    * marks for N touched files land in min(N, this) parquet files, each
    * written by its own task (the round-18 per-file-sidecar shape; the
    * old single `repartition(1)` funnel serialized every mark of a
    * broad ≤5% mutation through one task). */
  private[storage] val DvWriteBuckets = 64

  /** Write the FOLDED vectors of `touched` files into `newDvDir`,
    * PARTITIONED BY FILE BUCKET (round 18): each marked file's entries
    * land wholly inside one `__b=<xxhash64(file) % buckets>` subdir, the
    * write runs min(marked files, [[DvWriteBuckets]])-way parallel, and
    * every file's [[DvRef]] points at ITS OWN bucket — a reader of one
    * vectored file loads only that bucket's entries, never the commit's
    * whole vector set. Prior entries of the touched files' vectors fold
    * in first (chained merge-on-read commits FOLD, so each data file
    * references exactly ONE vector path); entries a SHARED old vector
    * holds for untouched files are filtered out — those files keep
    * referencing the old vector, and copying their entries forward
    * would duplicate them into every later fold. The filter set is
    * bounded (one distinct spelling per marked file, matched through
    * pathKey — manifest vs `_metadata` spellings differ only in scheme).
    * Returns per-file refs keyed by pathKey. DV bytes ∝ marked
    * positions (wide mutations belong on the copy-on-write path). */
  private def writeFoldedVector(spark: SparkSession, m: Manifest,
                                touched: Seq[String], newMarks: DataFrame,
                                newDvDir: String): Map[String, DvRef] = {
    val oldDvFiles = touched.flatMap(f => m.dvs.get(f).map(_.path)).distinct
    val touchedKeys = touched.map(pathKey).toSet
    val allMarks =
      (if (oldDvFiles.isEmpty) newMarks
       else {
         val oldEntries = spark.read.schema(DvSchema).parquet(oldDvFiles: _*)
         val keptSpellings = oldEntries.select(col("file")).distinct()
           .collect() // bounded: one row per marked file
           .map(_.getString(0)).filter(s => touchedKeys(pathKey(s)))
         if (keptSpellings.isEmpty) newMarks
         else oldEntries.filter(col("file").isin(
           keptSpellings.toSeq: _*)).unionByName(newMarks)
       }).distinct()
    val buckets = math.min(math.max(1, touched.size), DvWriteBuckets)
    allMarks
      .withColumn("__b", pmod(xxhash64(col("file")), lit(buckets.toLong)))
      .repartition(buckets, col("__b"))
      .write.partitionBy("__b").parquet(newDvDir)
    // read back WITH the partition column: each marked file's bucket and
    // count in one bounded pass (explicit schema — an all-carried commit
    // may have written zero marks, and schema inference has nothing)
    val perSpelling = spark.read
      .schema(StructType(DvSchema.fields :+
        StructField("__b", LongType, nullable = false)))
      .parquet(newDvDir)
      .groupBy(col("file"), col("__b")).agg(count(lit(1)).as("n"))
      .collect() // bounded: one row per marked file
      .map(r => (pathKey(r.getString(0)), r.getLong(1), r.getLong(2)))
    // bucketing hashed the RAW spelling but refs key by pathKey: if two
    // spellings of one file ever land in different buckets, a single-
    // bucket DvRef would silently drop the other bucket's marks
    // (resurrecting deleted rows) — refuse loudly instead of last-wins
    perSpelling.groupBy(_._1).map { case (key, rows) =>
      val bs = rows.map(_._2).distinct
      require(bs.size == 1,
        s"deletion-vector marks for $key split across buckets ${bs.sorted
          .mkString(",")} — the file was spelled inconsistently across " +
          "mark sources; refusing a ref that would drop marks")
      key -> DvRef(s"$newDvDir/__b=${bs.head}", rows.map(_._3).sum)
    }
  }

  /** the new version's dv map: touched files with fresh marks point at
    * their own bucket of the new folded vector; everything else carries
    * its prior ref */
  private def foldDvRefs(m: Manifest, touchedSet: Set[String],
                         refsByKey: Map[String, DvRef],
                         newDvDir: String): Map[String, DvRef] =
    m.files.flatMap { f =>
      refsByKey.get(pathKey(f)) match {
        case Some(ref) if touchedSet(f) => Some(f -> ref)
        case _ => m.dvs.get(f).map(f -> _)
      }
    }.toMap

  /** Copy-on-write row UPDATE (round 15 — the third of the SQL DML triad):
    * commit a new version (operation `update`) where rows matching
    * `rowCond` carry the `assignments` (column → new-value expression)
    * and every other row is byte-identical. SQL UPDATE semantics: every
    * assignment's right-hand side evaluates against the PRE-update row
    * (a `SET a = b, b = a` swap works), a null condition leaves the row
    * untouched, and assigned values cast to the column's committed type.
    * Write-side file skipping as in [[deleteCondition]]: files `prune`
    * proves clean are CARRIED with their stats; a provably-no-match
    * update commits nothing. Updating a PARTITION column moves rows to
    * their new `col=value` directories naturally (the rewrite is a
    * partitioned write). */
  /** resolve UPDATE assignment targets against the committed schema —
    * an unknown column must refuse, never silently append one */
  private def resolveAssignments(spark: SparkSession, m0: Manifest,
                                 assignments: Seq[(String, Column)])
      : Seq[(String, DataType, Column)] = {
    val cs = caseSensitive(spark)
    val schema0 = m0.schemaStruct.getOrElse(
      asNullableSchema(spark.read.parquet(m0.files: _*).schema))
    val idCols = identityOf(m0.properties).map(_._1)
    assignments.map { case (c, v) =>
      val f = schema0.fields.find(fl =>
        if (cs) fl.name == c else fl.name.equalsIgnoreCase(c))
        .getOrElse(refuse(s"update assigns unknown column $c — " +
          "add columns through commitAppend/merge schema evolution"))
      require(!idCols.exists(ic =>
        if (cs) ic == f.name else ic.equalsIgnoreCase(f.name)),
        s"column ${f.name} is GENERATED ALWAYS AS IDENTITY — it cannot " +
          "be assigned")
      (f.name, f.dataType, v)
    }
  }

  private[graft] def updateCondition(spark: SparkSession, dir: String,
                                     rowCond: Column,
                                     prune: Option[FilePredicate],
                                     assignments: Seq[(String, Column)],
                                     reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(assignments.nonEmpty, "update needs at least one assignment")
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    val h0 = headerInfoOf(spark, dir, cur)
    val resolved = resolveAssignments(spark,
      if (h0.schema.isDefined) h0.lite else manifest(spark, dir, cur),
      assignments)
    prune.foreach { p =>
      if (prunedFilesBounded(spark, dir, cur, p).isEmpty)
        return cur // stats prove no row matches: nothing to rewrite
    }
    // BOUNDED stage (round 20) — see deleteCondition
    commitStagedFull(spark, dir, "update", reclaimGraceMs,
      stageBounded = Some { (hdrOpt, dataDir) =>
        val h = hdrOpt.getOrElse(refuse(s"no committed version at $dir"))
        val (mView, touched) = dvMutationView(spark, dir, h.version, prune)
        val m = mView
      if (touched.nonEmpty) {
        val base = readFiles(spark, dir, m, touched)
        // ALL right-hand sides AND the condition evaluate against the
        // pre-update row: stage them as temp columns first, then swap in.
        // The condition must be staged too — re-resolving it inside the
        // swap fold would evaluate it against already-swapped columns
        // when it references an assigned column (`SET a = a - 1, b = 0
        // WHERE a > 10` would update `a` then skip `b`), violating SQL
        // UPDATE's evaluate-once-against-the-pre-image semantics.
        val hitCol = "__upd_hit"
        val tmp = resolved.zipWithIndex.map { case ((c, t, v), i) =>
          (c, t, s"__upd_$i", v)
        }
        val staged = tmp.foldLeft(
          base.withColumn(hitCol, coalesce(rowCond, lit(false)))) {
          case (df, (_, t, tc, v)) => df.withColumn(tc, v.cast(t))
        }
        val applied = tmp.foldLeft(staged) { case (df, (c, _, tc, _)) =>
          df.withColumn(c, when(col(hitCol), col(tc)).otherwise(col(c)))
        }.drop(hitCol +: tmp.map(_._3): _*)
        writeData(applied, dataDir, m.partitionCols,
          toPhysical = mappingOf(m))
      }
        Staged(Seq.empty, Map.empty, removes = touched)
      }) { (_, _) => sys.error("unreachable: bounded stage set") }
  }

  /** MERGE-ON-READ row UPDATE (round 17 — deletion vectors extended to
    * the second DML verb): instead of rewriting every file that might
    * hold a match, commit a version that CARRIES every data file,
    * vectors the matched PRE-IMAGE positions (folded like
    * [[deleteWhereDv]]'s), and APPENDS only the POST-IMAGE rows as new
    * files — a 1-row UPDATE in a 128 MB file writes O(1) data rows +
    * O(marks) vector bytes, not O(file). Same SQL UPDATE semantics as
    * the copy-on-write path: every right-hand side (and the condition)
    * evaluates against the pre-update row, null conditions leave rows
    * untouched, values cast to committed types; updating a PARTITION
    * column lands post-images under their new `col=value` dirs
    * naturally. The row-grain CDF derives from snapshots, so
    * update_preimage/postimage surface identically on both paths
    * (parity spec'd). Any later rewrite of a vectored file materializes
    * the masks away, exactly as for DV deletes. */
  private[graft] def updateConditionDv(spark: SparkSession, dir: String,
                                       rowCond: Column,
                                       prune: Option[FilePredicate],
                                       assignments: Seq[(String, Column)],
                                       reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(assignments.nonEmpty, "update needs at least one assignment")
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    val h0 = headerInfoOf(spark, dir, cur)
    val resolved = resolveAssignments(spark,
      if (h0.schema.isDefined) h0.lite else manifest(spark, dir, cur),
      assignments)
    prune.foreach { p =>
      if (prunedFilesBounded(spark, dir, cur, p).isEmpty)
        return cur // stats prove no row matches: nothing to mark
    }
    // BOUNDED stage (round 20): like deleteConditionDv — survivors-only
    // touched selection, header-carried dv map, adds-only delta
    commitStagedFull(spark, dir, "update-dv", reclaimGraceMs,
      stageBounded = Some { (hdrOpt, dataDir) =>
        val h = hdrOpt.getOrElse(refuse(s"no committed version at $dir"))
        val (mView, touched) = dvMutationView(spark, dir, h.version, prune)
        val newDvDir = fs(spark, dir)
          .makeQualified(new Path(s"$dataDir/_dv")).toString
        val countsByKey: Map[String, DvRef] =
          if (touched.isEmpty) Map.empty
          else {
            // PERSIST the marked pre-image rows: this plan evaluates
            // twice (the vector write below, the post-image write
            // after) and a non-deterministic condition (rand(),
            // current_timestamp) would otherwise mask one row set and
            // append post-images for a DIFFERENT one — silently losing
            // or duplicating rows. The same multi-evaluation reason
            // merge/mergeAuto persist their delta.
            val hit = liveWithProvenance(spark, dir, mView, touched)
              .filter(coalesce(rowCond, lit(false)))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
            val counts = writeFoldedVector(spark, mView, touched,
              hit.select(col("__dv_file").as("file"),
                col("__dv_pos").as("pos")), newDvDir)
            if (counts.nonEmpty) {
              // POST-IMAGE rows append as the version's new data files.
              // Right-hand sides evaluate against the pre-image: stage
              // them as temp columns FIRST, then swap in (`SET a = b,
              // b = a` must exchange, not chain).
              val tmp = resolved.zipWithIndex.map { case ((c, t, v), i) =>
                (c, t, s"__upd_$i", v)
              }
              val stagedDf = tmp.foldLeft(hit) {
                case (df, (_, t, tc, v)) => df.withColumn(tc, v.cast(t))
              }
              val post = tmp.foldLeft(stagedDf) { case (df, (c, _, tc, _)) =>
                df.withColumn(c, col(tc))
              }.drop(tmp.map(_._3): _*).drop("__dv_file", "__dv_pos")
              writeData(post, dataDir, mView.partitionCols, append = true,
                toPhysical = mappingOf(mView))
            }
            counts
            } finally hit.unpersist()
          }
        Staged(Seq.empty, Map.empty,
          Some(boundedDvFold(h.dvs, touched, countsByKey)))
      }) { (_, _) => sys.error("unreachable: bounded stage set") }
  }

  /** Measured AUTO-dispatch between the DV and CoW update paths — the
    * SQL `UPDATE` route, mirroring [[deleteConditionAuto]]: one counting
    * scan of the stats-pruned touched files decides (matched == 0 → no
    * commit at all; matched ≤ [[DvAutoThreshold]] of the touched live
    * rows → [[updateConditionDv]]; else, or when any touched file lacks
    * row stats, → copy-on-write [[updateCondition]]). */
  private[graft] def updateConditionAuto(spark: SparkSession, dir: String,
                                         rowCond: Column,
                                         prune: Option[FilePredicate],
                                         assignments: Seq[(String, Column)],
                                         reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    val h0 = headerInfoOf(spark, dir, cur)
    resolveAssignments(spark,
      if (h0.schema.isDefined) h0.lite else manifest(spark, dir, cur),
      assignments) // refuse unknown targets first
    // bounded dispatch measurement (round 20) — see deleteConditionAuto
    val (m, touched) = dvMutationView(spark, dir, cur, prune)
    if (touched.isEmpty) return cur
    val marked = readFiles(spark, dir, m, touched)
      .filter(coalesce(rowCond, lit(false))).count()
    if (marked == 0L) return cur
    val statless = touched.exists(f => !m.stats.contains(f))
    val total = math.max(1L, touched.flatMap(m.stats.get).map(_.rows).sum -
      touched.flatMap(m.dvs.get).map(_.rows).sum)
    if (!statless && marked.toDouble / total <= DvAutoThreshold)
      updateConditionDv(spark, dir, rowCond, prune, assignments, reclaimGraceMs)
    else updateCondition(spark, dir, rowCond, prune, assignments, reclaimGraceMs)
  }

  /** Copy-on-write MERGE (upsert) keyed on `keyCols`: rows of `delta`
    * REPLACE same-key rows of the latest version; new-key rows APPEND —
    * one new version (operation `merge`), atomic like every commit.
    *
    * Write-side file skipping: one bounded aggregation computes the
    * delta's key ENVELOPE (per-key-column min/max); only prior files
    * whose committed stats intersect the envelope are rewritten (their
    * non-matching rows survive via an anti-join on the key), everything
    * else is carried untouched with its stats. On an ingest keyed by a
    * clustered or naturally ordered key (time, monotonic id) the
    * envelope touches the tail files only — the commit is O(touched
    * bytes + delta), never O(table). The anti-join's delta side is a
    * key-column projection (broadcast by AQE when small, as upsert
    * deltas typically are).
    *
    * Contracts: `delta` must carry the table's columns (checked by the
    * union); keys must be non-null and unique within `delta` (same-key
    * delta rows would all survive — dedup first, e.g.
    * [[graft.operators.ChangeFeed.dedupLatest]]); an empty delta is a
    * no-op returning the current version. With no committed version this
    * is [[commit]] — `partitionBy`/`bloomCols` apply to exactly that
    * table-CREATING case (a CDC-mirror stream's first batch fixes the
    * hive layout and bloom declaration) and are ignored once a layout
    * is committed (inheritance, like every carry-style commit). The
    * change feed surfaces rewritten files (CoW CDC grain — see
    * [[deleteWhere]]). */
  def merge(spark: SparkSession, dir: String, delta: DataFrame,
            keyCols: Seq[String],
            reclaimGraceMs: Long = DefaultReclaimGraceMs,
            operation: String = "merge",
            partitionBy: Seq[String] = Seq.empty,
            bloomCols: Seq[String] = Seq.empty,
            tblProperties: Map[String, String] = Map.empty): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    if (latestVersion(spark, dir).isEmpty)
      return commit(spark, dir, delta, operation, reclaimGraceMs,
        partitionBy = partitionBy, bloomCols = bloomCols,
        tblProperties = tblProperties)
    refuseIdentityUpsert(headerInfoOf(spark, dir,
      latestVersion(spark, dir).get).properties, "merge")
    preValidateEvolution(spark, dir, delta)
    // MATERIALIZE the delta before anything reads it: the plan evaluates
    // several times (key envelope, anti-join, union write, lost-race
    // retries) and a non-deterministic or changing-source delta would
    // otherwise let its envelope under-cover the keys actually written —
    // silently duplicating keys and breaking the unique-key invariant
    // readRowChanges/startUpsert rely on (Delta materializes its MERGE
    // source for exactly this reason). A caller-persisted delta is used
    // as-is (Dataset.persist on a cached frame only logs, so "already
    // cached" must be read off the CacheManager, not an exception).
    val weCached = !org.apache.spark.sql.graft.CacheBridge.isCached(delta)
    if (weCached)
      delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pred = mergeEnvelope(delta, keyCols).getOrElse(
        return latestVersion(spark, dir).get) // empty delta: no-op
      mergeCowImpl(spark, dir, delta, keyCols, pred, reclaimGraceMs, operation)
    } finally if (weCached) delta.unpersist()
  }

  /** the copy-on-write merge commit, with the envelope already computed
    * (and the delta already persisted) by the caller — [[merge]] and
    * [[mergeAuto]] share it so the dispatch never re-runs the envelope
    * aggregation */
  private def mergeCowImpl(spark: SparkSession, dir: String, delta: DataFrame,
                           keyCols: Seq[String], pred: FilePredicate,
                           reclaimGraceMs: Long, operation: String): Long =
    // BOUNDED stage (round 20) — see deleteCondition
    commitStagedFull(spark, dir, operation, reclaimGraceMs,
      stageBounded = Some { (hdrOpt, dataDir) =>
        val h = hdrOpt.getOrElse(refuse(s"no committed version at $dir"))
        val (mView, touched) =
          dvMutationView(spark, dir, h.version, Some(pred))
        val survivors =
          if (touched.isEmpty) delta.limit(0)
          else readFiles(spark, dir, mView, touched)
            .join(delta.select(keyCols.map(col): _*), keyCols, "left_anti")
        // allowMissingColumns: an evolved delta's NEW columns null-fill in
        // survivors; a delta omitting non-key table columns null-fills its
        // own rows (the Delta automatic-evolution contract). Expression
        // defaults apply to the writer-authored DELTA side only — the
        // carried survivors' rows must rewrite byte-faithfully.
        writeData(survivors.unionByName(
          applyColumnDefaults(spark, delta, generatedOf(h.properties)),
          allowMissingColumns = true),
          dataDir, mView.partitionCols, toPhysical = mappingOf(mView))
        Staged(Seq.empty, Map.empty, removes = touched)
      }) { (_, _) => sys.error("unreachable: bounded stage set") }

  /** The delta's key ENVELOPE as a write-side file predicate — one
    * bounded (single-row) aggregation. The exact distinct-key count
    * rides it, so duplicate-key deltas refuse BEFORE any commit
    * (ANSI/Delta MERGE's "cannot update the same row twice": both
    * copies would survive and silently break the unique-key invariant
    * readRowChanges and startUpsert rely on); null keys refuse too.
    * None = empty delta (a no-op at every call site). */
  private def mergeEnvelope(delta: DataFrame,
                            keyCols: Seq[String]): Option[FilePredicate] = {
    val aggs = (count(lit(1)).as("__n") +:
      keyCols.flatMap(k => Seq(
        min(col(k)).as(s"__mn_$k"), max(col(k)).as(s"__mx_$k"),
        count(when(col(k).isNull, 1)).as(s"__nulls_$k")))) :+
      countDistinct(struct(keyCols.map(col): _*)).as("__kd")
    val env = delta.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (env.getLong(0) == 0L) return None
    val pred = keyCols.zipWithIndex.map { case (k, i) =>
      require(env.getLong(1 + 3 * i + 2) == 0L,
        s"merge key column $k holds null values — keys must be non-null")
      FilePredicate.between(k, env.get(1 + 3 * i), env.get(1 + 3 * i + 1))
        : FilePredicate
    }.reduce(FilePredicate.And(_, _))
    require(env.getLong(env.length - 1) == env.getLong(0),
      s"merge delta holds duplicate keys on (${keyCols.mkString(", ")}) — " +
        "a key may map to ONE row; dedup first (e.g. ChangeFeed.dedupLatest)")
    Some(pred)
  }

  /** MERGE-ON-READ upsert (round 17 — deletion vectors extended to the
    * third DML verb): the same contract as [[merge]], executed as ONE
    * commit that CARRIES every data file, vectors the matched (replaced)
    * rows' pre-image positions in the envelope-touched files, and
    * appends the WHOLE delta as new files — an upsert whose keys hit a
    * sliver of each touched file writes O(delta + marks) bytes instead
    * of rewriting every touched file. Readers, CDF, and purge behave
    * exactly as for DV deletes; prefer [[merge]] (copy-on-write) when
    * the delta replaces most rows of the files it touches —
    * [[mergeAuto]] measures and picks. */
  def mergeDv(spark: SparkSession, dir: String, delta: DataFrame,
              keyCols: Seq[String],
              reclaimGraceMs: Long = DefaultReclaimGraceMs,
              operation: String = "merge-dv"): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    if (latestVersion(spark, dir).isEmpty)
      return commit(spark, dir, delta, operation, reclaimGraceMs)
    refuseIdentityUpsert(headerInfoOf(spark, dir,
      latestVersion(spark, dir).get).properties, "merge")
    preValidateEvolution(spark, dir, delta)
    val weCached = !org.apache.spark.sql.graft.CacheBridge.isCached(delta)
    if (weCached)
      delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pred = mergeEnvelope(delta, keyCols).getOrElse(
        return latestVersion(spark, dir).get) // empty delta: no-op
      mergeDvImpl(spark, dir, delta, keyCols, pred, reclaimGraceMs, operation)
    } finally if (weCached) delta.unpersist()
  }

  /** the merge-on-read merge commit, envelope precomputed (see
    * [[mergeCowImpl]]) — the marks semi-join runs INSIDE the commit
    * loop against the in-loop prior (a lost-race retry must re-mark
    * against the rival's committed state), so only the envelope is
    * shareable with the dispatch */
  private def mergeDvImpl(spark: SparkSession, dir: String, delta: DataFrame,
                          keyCols: Seq[String], pred: FilePredicate,
                          reclaimGraceMs: Long, operation: String): Long =
    // BOUNDED stage (round 20): the envelope-touched selection runs
    // through the distributed prune, the header's dv map carries whole,
    // the delta appends as the adds — the prior file list never
    // materializes on a typical narrow upsert
    commitStagedFull(spark, dir, operation, reclaimGraceMs,
      stageBounded = Some { (hdrOpt, dataDir) =>
        val h = hdrOpt.getOrElse(refuse(s"no committed version at $dir"))
        val (mView, touched) =
          dvMutationView(spark, dir, h.version, Some(pred))
        val newDvDir = fs(spark, dir)
          .makeQualified(new Path(s"$dataDir/_dv")).toString
        val countsByKey: Map[String, DvRef] =
          if (touched.isEmpty) Map.empty
          else {
            // pre-image positions of the REPLACED rows: live rows of the
            // touched files whose key appears in the delta (semi-join on
            // the key projection — broadcast by AQE for typical deltas)
            val marks = liveWithProvenance(spark, dir, mView, touched)
              .join(delta.select(keyCols.map(col): _*), keyCols, "left_semi")
              .select(col("__dv_file").as("file"), col("__dv_pos").as("pos"))
            writeFoldedVector(spark, mView, touched, marks, newDvDir)
          }
        // the whole delta appends — replacements AND new keys — exactly
        // the bytes the caller handed in plus any declared expression
        // defaults (append mode: the hidden `_dv` write above already
        // created our claimed version dir)
        writeData(
          applyColumnDefaults(spark, delta, generatedOf(h.properties)),
          dataDir, h.partitionCols, append = true,
          toPhysical = mappingOf(mView))
        Staged(Seq.empty, Map.empty,
          Some(boundedDvFold(h.dvs, touched, countsByKey)))
      }) { (_, _) => sys.error("unreachable: bounded stage set") }

  /** Measured AUTO-dispatch between the DV and CoW merge paths — the
    * SQL `MERGE INTO` route, completing the DML triad's dispatch
    * symmetry ([[deleteConditionAuto]], [[updateConditionAuto]]): one
    * key-projection counting join over the envelope-touched files
    * decides — matched ≤ [[DvAutoThreshold]] of their live rows →
    * [[mergeDv]] (carry + vector + append); wider, stats-less touched
    * files, or an empty touched set → copy-on-write [[merge]]. The
    * count costs one column-pruned scan + semi-join, the same class as
    * either path's own anti/semi-join. */
  def mergeAuto(spark: SparkSession, dir: String, delta: DataFrame,
                keyCols: Seq[String],
                reclaimGraceMs: Long = DefaultReclaimGraceMs,
                operation: String = "merge",
                partitionBy: Seq[String] = Seq.empty,
                bloomCols: Seq[String] = Seq.empty): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    if (latestVersion(spark, dir).isEmpty)
      return merge(spark, dir, delta, keyCols, reclaimGraceMs, operation,
        partitionBy, bloomCols)
    val weCached = !org.apache.spark.sql.graft.CacheBridge.isCached(delta)
    if (weCached)
      delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cur = latestVersion(spark, dir).get
      refuseIdentityUpsert(headerInfoOf(spark, dir, cur).properties, "merge")
      preValidateEvolution(spark, dir, delta) // cheap early exit, both paths
      // ONE envelope aggregation serves dispatch AND commit (the impls
      // take the precomputed predicate — no re-run)
      val pred = mergeEnvelope(delta, keyCols).getOrElse(return cur)
      // bounded dispatch measurement (round 20) — see deleteConditionAuto
      val (m, touched) = dvMutationView(spark, dir, cur, Some(pred))
      val statless = touched.exists(f => !m.stats.contains(f))
      val dv = touched.nonEmpty && !statless && {
        val matched = liveWithProvenance(spark, dir, m, touched)
          .join(delta.select(keyCols.map(col): _*), keyCols, "left_semi")
          .count()
        val total = math.max(1L,
          touched.flatMap(m.stats.get).map(_.rows).sum -
            touched.flatMap(m.dvs.get).map(_.rows).sum)
        matched.toDouble / total <= DvAutoThreshold
      }
      if (dv)
        mergeDvImpl(spark, dir, delta, keyCols, pred, reclaimGraceMs,
          if (operation == "merge") "merge-dv" else operation)
      else mergeCowImpl(spark, dir, delta, keyCols, pred, reclaimGraceMs,
        operation)
    } finally if (weCached) delta.unpersist()
  }

  // stats-supported column types. Decimal records EXACT unscaled-long
  // bounds (round 16 — a rounded double bound could prune a boundary
  // file incorrectly, so the encoding is exact or absent): precision
  // <= 18 guarantees the unscaled value fits a long; wider decimals
  // stay untracked (conservative — never prune).
  private def statsSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType => true
    case StringType | BooleanType => true
    case DateType | TimestampType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  private def statValue(v: Any): Option[Any] = Option(v).map {
    case n: java.lang.Byte => n.longValue()
    case n: java.lang.Short => n.longValue()
    case n: Integer => n.longValue()
    case n: java.lang.Long => n.longValue()
    case n: java.lang.Float => n.doubleValue()
    case n: java.lang.Double => n.doubleValue()
    case s: String => s
    case b: java.lang.Boolean => b.booleanValue()
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    // decimal(p<=18, s): the EXACT unscaled long at the column's scale
    // (Spark hands values back at declared scale); the simpleString
    // "decimal(p,s)" riding ColStats.dataType carries the scale to the
    // probe side
    case d: java.math.BigDecimal => d.unscaledValue().longValueExact()
    case d: scala.math.BigDecimal => d.bigDecimal.unscaledValue().longValueExact()
    case other => sys.error(s"unsupported stat value $other")
  }

  /** normalize `file:/p`, `file:///p`, `/p` to one comparable key */
  private def pathKey(s: String): String = new Path(s).toUri.getPath

  // ------------------------------------------------- column mapping (r17)

  /** COLUMN MAPPING (round 17 — Delta's name-mode mapping): a renamed
    * column's PHYSICAL (parquet) name rides its StructField metadata
    * under this key; absent = physical == logical. Data files ALWAYS
    * spell physical names (the original name at column birth — so every
    * file ever written stays readable), stats and blooms key by
    * physical, reads alias physical → logical, and a rename is a
    * metadata-only commit that touches zero data bytes. */
  private[storage] val PhysicalNameKey = "graft.physical"

  private[storage] def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey))
      f.metadata.getString(PhysicalNameKey)
    else f.name

  /** logical → physical for the fields that differ (empty = unmapped
    * table — every pre-rename table, where the translation is free) */
  private[storage] def physicalOf(schema: StructType): Map[String, String] =
    schema.fields.iterator
      .filter(f => physicalName(f) != f.name)
      .map(f => f.name -> physicalName(f)).toMap

  private[storage] def mappingOf(m: Manifest): Map[String, String] =
    m.schemaStruct.map(physicalOf).getOrElse(Map.empty)

  /** the schema as the parquet files spell it */
  private[storage] def toPhysicalSchema(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = physicalName(f))))

  /** a [[FilePredicate]] over LOGICAL names rewritten to the PHYSICAL
    * names the stats are keyed by — identity for unmapped tables */
  private[storage] def toPhysicalPred(p: FilePredicate,
                                      m: Map[String, String]): FilePredicate = {
    import FilePredicate._
    if (m.isEmpty) p
    else {
      def go(q: FilePredicate): FilePredicate = q match {
        case EqTo(c, v) => EqTo(m.getOrElse(c, c), v)
        case InSet(c, vs) => InSet(m.getOrElse(c, c), vs)
        case GtEq(c, v) => GtEq(m.getOrElse(c, c), v)
        case Gt(c, v) => Gt(m.getOrElse(c, c), v)
        case LtEq(c, v) => LtEq(m.getOrElse(c, c), v)
        case Lt(c, v) => Lt(m.getOrElse(c, c), v)
        case IsNull(c) => IsNull(m.getOrElse(c, c))
        case IsNotNull(c) => IsNotNull(m.getOrElse(c, c))
        case And(l, r) => And(go(l), go(r))
        case Or(l, r) => Or(go(l), go(r))
      }
      go(p)
    }
  }

  /** the might-match file set of `prune` against one manifest — EVERY
    * write-side skipping site routes here, so the logical→physical
    * translation can never be forgotten at one of them */
  private def mightMatchFiles(spark: SparkSession, m: Manifest,
                              prune: Option[FilePredicate]): Seq[String] =
    prune match {
      case None => m.files
      case Some(p0) =>
        pruneWithBlooms(spark, m.files, m.stats.get,
          toPhysicalPred(p0, mappingOf(m)))
    }

  /** Bounded in-JVM cache of DECODED sidecar blooms, keyed (sidecar
    * path, CONTENT fingerprint, ord): ≤1024 entries × 8 KB ≈ 8 MB — a
    * hot point-lookup table stops re-reading its candidate sidecars per
    * query, and the bound holds whatever the table's file count is (the
    * manifest cache may hold 800k-entry states; this one never grows
    * with them). The FINGERPRINT in the key is the staleness guard
    * (round 20 — hardened from the dir mtime, which object stores
    * synthesize and local filesystems tick coarsely): the sidecar
    * dir's LISTING — each part's (name, length, mtime) — keys the
    * entry, and parquet part names embed a per-write UUID, so a
    * dropped-and-recreated table at the same path can NEVER validate
    * against the old table's bits (serving them would WRONGLY PRUNE
    * files that hold the probed value — and pruneWithBlooms now gates
    * write paths too, where a wrong prune silently skips deletes). One
    * listStatus per touched sidecar per load is the price, far below
    * the parquet read it saves; stale entries age out of the LRU. */
  private val SidecarBloomCacheCapacity = 1024
  private val sidecarBloomCache =
    new java.util.LinkedHashMap[(String, String, Long),
        org.apache.spark.util.sketch.BloomFilter](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Long),
            org.apache.spark.util.sketch.BloomFilter]): Boolean =
        size() > SidecarBloomCacheCapacity
    }

  /** content identity of one sidecar dir: every part's
    * (name, len, mtime), sorted — parquet part names carry a per-write
    * UUID, so any rewrite (table recreation included) changes this
    * even when dir mtimes do not. None = unlistable (dangling sidecar:
    * conservative keep, no cache). */
  private def sidecarFingerprint(spark: SparkSession,
                                 sc: String): Option[String] =
    try {
      val p = new Path(sc)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Some(f.listStatus(p).iterator.map(st =>
          s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .toSeq.sorted.mkString("|"))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** spec instrumentation: sidecar parquet READS (cache misses) and the
    * sidecar dirs the most recent load touched — the laziness contract
    * ("a probe touches at most the candidate files' sidecars, and none
    * when min/max already pruned them") is asserted on these */
  private[storage] val sidecarReadCount =
    new java.util.concurrent.atomic.AtomicLong
  // per-thread (round 20): a rival query's load must not clobber the
  // fence a spec reads right after its own call; cross-thread fallback
  // (round 21): a load on a planning-pool thread is still visible to a
  // reader whose own thread never ran one (same shape as
  // lastDistributedPrune above)
  private val lastSidecarReadsTl =
    ThreadLocal.withInitial[Option[Seq[String]]](() => None)
  @volatile private var lastSidecarReadsGlobal: Seq[String] = Seq.empty
  private def setLastSidecarReads(v: Seq[String]): Unit = {
    lastSidecarReadsTl.set(Some(v))
    lastSidecarReadsGlobal = v
  }
  private[storage] def lastSidecarReads: Seq[String] =
    lastSidecarReadsTl.get().getOrElse(lastSidecarReadsGlobal)
  private[storage] def clearSidecarBloomCacheForTest(): Unit =
    sidecarBloomCache.synchronized(sidecarBloomCache.clear())

  /** Bulk-load requested sidecar bloom bits: one ord-pushdown parquet
    * read per TOUCHED sidecar, behind the bounded cache. An unreadable
    * or dangling sidecar (vacuumed source of a shallow clone) loads
    * nothing — its files conservatively KEEP, never a wrong answer. */
  private def loadSidecarBlooms(spark: SparkSession,
                                needed: Seq[(String, Seq[Long])])
      : Map[(String, Long), org.apache.spark.util.sketch.BloomFilter] = {
    val out = Map.newBuilder[(String, Long),
      org.apache.spark.util.sketch.BloomFilter]
    val reads = scala.collection.mutable.ArrayBuffer.empty[String]
    needed.foreach { case (sc, ords) =>
      // one listing RPC per touched sidecar: the content-fingerprint
      // staleness guard (and the dangling-sidecar early-out —
      // conservative keep)
      val fp = sidecarFingerprint(spark, sc)
      fp.foreach { mt =>
        val missing = ords.distinct.filterNot { o =>
          val got = sidecarBloomCache.synchronized(
            sidecarBloomCache.get((sc, mt, o)))
          if (got != null) { out += ((sc, o)) -> got; true } else false
        }
        if (missing.nonEmpty) try {
          sidecarReadCount.incrementAndGet()
          reads += sc
          val df = spark.read.schema(BloomSidecarSchema).parquet(sc)
          // ord pushdown for selective probes; a huge candidate sliver
          // (a non-selective predicate over one commit) bounds the scan
          // by ord RANGE instead — an oversized IN list costs more in
          // the plan than it prunes
          val filtered =
            if (missing.size <= 1000) df.filter(col("ord").isin(missing: _*))
            else df.filter(col("ord").between(missing.min, missing.max))
          val want = missing.toSet
          filtered.select("ord", "bits").collect() // bounded: candidates
            .foreach { r =>
              val o = r.getLong(0)
              if (want(o)) {
                val bf = org.apache.spark.util.sketch.BloomFilter
                  .readFrom(r.getAs[Array[Byte]](1))
                sidecarBloomCache.synchronized(
                  sidecarBloomCache.put((sc, mt, o), bf))
                out += ((sc, o)) -> bf
              }
            }
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    setLastSidecarReads(reads.distinct.toSeq)
    out.result()
  }

  /** Two-phase lazy-sidecar pruning (round 19) — EVERY stats-skipping
    * surface routes here. Phase 1 prunes on min/max / null counts /
    * inline blooms alone (sidecar-backed blooms conservatively keep);
    * phase 2 loads sidecar bits ONLY for phase-1 survivors that carry
    * one on a probed column — the candidate sliver — and re-evaluates
    * just those files. A point lookup on an 800k-file table therefore
    * reads bloom bytes for the handful of files min/max could not
    * prune, never the table's. */
  private[storage] def pruneWithBlooms(spark: SparkSession,
                                       files: Seq[String],
                                       statsOf: String => Option[FileStats],
                                       pred: FilePredicate): Seq[String] = {
    val phase1 = files.filter(f => statsOf(f).forall(st => pred.mightMatch(st)))
    val probeCols = pred.bloomProbeCols
    if (probeCols.isEmpty) return phase1
    val needed = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Long]]
    val pending = scala.collection.mutable.ArrayBuffer.empty[String]
    phase1.foreach { f =>
      statsOf(f).foreach { st =>
        var has = false
        probeCols.foreach(c => st.blooms.get(c).foreach(_.sidecar.foreach {
          sc =>
            has = true
            needed.getOrElseUpdate(sc,
              scala.collection.mutable.ArrayBuffer.empty[Long]) +=
              st.blooms(c).ord
        }))
        if (has) pending += f
      }
    }
    if (pending.isEmpty) { setLastSidecarReads(Seq.empty); return phase1 }
    val br = new FilePredicate.LoadedResolve(
      loadSidecarBlooms(spark, needed.toSeq.map(kv => kv._1 -> kv._2.toSeq)))
    val pendSet = pending.toSet
    phase1.filter(f => !pendSet(f) ||
      statsOf(f).forall(st => pred.mightMatch(st, br)))
  }

  /** One parquet sidecar row per (file, declared bloom column): the
    * bloom BITS live here as binary, outside the manifest (round 19 —
    * the Delta bloom-index sidecar discipline). `ord` is the row's
    * stable index, referenced by [[BloomStats.ord]]. */
  private[storage] val BloomSidecarSchema = StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("col", StringType, nullable = false),
    StructField("t", StringType, nullable = false),
    StructField("bits", BinaryType, nullable = false)))

  /** the commit's bloom sidecar dir — HIDDEN (`_`-prefixed) inside the
    * version directory, so the data listing never surfaces it and
    * vacuum's referenced-file retention covers it for free: a file and
    * its bloom bits live (and die) in the same version dir */
  private def bloomSidecarDirOf(dataDir: String): String = s"$dataDir/_blooms"

  /** One column-pruned scan of the freshly written files (`df` = their
    * already-opened reader), grouped by file: exact row count + min/max
    * per supported top-level column, plus one [[BloomStats]] per
    * DECLARED bloom column (`BloomFilterAggregate` over the XxHash64 of
    * the column — Spark's own runtime-filter machinery, map-side
    * combined like every other aggregate here). Distributed (no driver
    * loop over files) and reads only the stats columns — O(new data) in
    * the stats columns' bytes. Bloom bits land in the commit's parquet
    * SIDECAR under `sidecarDir` and the returned stats carry only the
    * (sidecar, ord) pointer — the manifest never holds bloom bytes
    * (the collected bits are a bounded per-commit TRANSIENT here, not
    * driver residency). Every production caller passes a sidecar dir;
    * the inline-base64 fallback remains for None (legacy parity). */
  /** Per-file stats read from the PARQUET FOOTERS the commit just wrote
    * — the write pass IS the stats pass (round 21; optimization guide
    * §1.2 "don't compute things twice": the previous shape re-scanned
    * every fresh data file with a groupBy(input_file_name) aggregate,
    * a second full pass over all new data on every commit). A footer
    * already carries exact per-row-group min/max/null-count/row-count
    * for every column, and parquet-mr 1.16 writes chunk statistics
    * UNTRUNCATED by default (DEFAULT_STATISTICS_TRUNCATE_LENGTH =
    * Int.MaxValue, verified against the bundled jar), so the derived
    * stats are value-identical to the scan's for every supported type:
    * integral/date decode to the same Long, float/double to the same
    * Double, decimal(p<=18) to the same unscaled Long (INT32/INT64
    * physical, FIXED/BINARY legacy), strings to the same UTF-8 value
    * under the same unsigned byte order UTF8String compares with.
    *
    * Returns None — caller falls back to the one-scan [[collectStats]]
    * — whenever footer parity cannot be guaranteed structurally:
    * declared bloom columns (their bits need a data pass), hive
    * partition columns (elided from the files, so footers cannot see
    * them), a TimestampType stats column (Spark's default INT96
    * encoding carries no usable footer statistics), or any read error.
    *
    * Two DELIBERATE, conservative-only divergences from the scan:
    * a string column keeps stats when its min/max VALUES are within
    * [[MaxStatsStringLen]] (the scan dropped on the longest value —
    * both rules bound manifest bytes; having stats the scan would have
    * dropped only ever prunes MORE files, never a wrong answer), and a
    * float/double chunk parquet declined to stat (NaN present) drops
    * bounds the scan would have recorded (pruning keeps the file —
    * conservative). Zero-row files record NO entry, exactly like the
    * scan (the "empty frame writes a schema-only part file with no
    * stats entry" contract conservative pruning relies on). */
  private[storage] def collectStatsFromFooters(spark: SparkSession,
                                               df: DataFrame,
                                               files: Seq[String],
                                               sizes: Map[String, Long])
      : Option[Map[String, FileStats]] = {
    import scala.jdk.CollectionConverters._
    if (files.isEmpty) return Some(Map.empty)
    val statCols = df.schema.fields.filter(f => statsSupported(f.dataType))
      .take(MaxStatsColumns).toSeq
    // INT96 timestamps carry no usable footer statistics
    if (statCols.exists(_.dataType == TimestampType)) return None
    val conf = spark.sparkContext.hadoopConfiguration
    // unsigned lexicographic byte order — the order parquet's UTF8
    // comparator sorted the stats by, and the order UTF8String compares
    // with (java String order differs on supplementary chars: compare
    // BYTES, decode the winner)
    def cmpU(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    def decodeLong(v: AnyRef): Long = v match {
      case n: java.lang.Number => n.longValue()
      case b: org.apache.parquet.io.api.Binary =>
        // legacy decimal encoding: big-endian two's-complement unscaled
        new java.math.BigInteger(b.getBytes).longValueExact()
      case other => sys.error(s"unexpected footer stat value $other")
    }
    try {
      val out = files.flatMap { f =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(f), conf))
        try {
          val blocks = rd.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          if (rows == 0L) None // parity: scan records no entry either
          else {
            val cols = statCols.flatMap { fl =>
              val chunks = blocks.flatMap(_.getColumns.asScala.filter(c =>
                c.getPath.size == 1 && c.getPath.toDotString == fl.name))
              val sts = chunks.map(_.getStatistics)
              if (chunks.size != blocks.size ||
                  sts.exists(s => s == null || !s.isNumNullsSet)) None
              else {
                val nulls = sts.map(_.getNumNulls).sum
                val nonNull = sts.filter(_.hasNonNullValue)
                val dt = fl.dataType.simpleString
                if (nonNull.isEmpty) {
                  if (nulls == rows)
                    Some(fl.name -> ColStats(dt, None, None, Some(nulls)))
                  else None // stats omitted (NaN chunk): conservative drop
                } else {
                  def mins = nonNull.map(_.genericGetMin.asInstanceOf[AnyRef])
                  def maxs = nonNull.map(_.genericGetMax.asInstanceOf[AnyRef])
                  fl.dataType match {
                    case ByteType | ShortType | IntegerType | LongType |
                         DateType | _: DecimalType =>
                      Some(fl.name -> ColStats(dt,
                        Some(mins.map(decodeLong).min),
                        Some(maxs.map(decodeLong).max), Some(nulls)))
                    case FloatType | DoubleType =>
                      Some(fl.name -> ColStats(dt,
                        Some(mins.map(_.asInstanceOf[Number].doubleValue()).min),
                        Some(maxs.map(_.asInstanceOf[Number].doubleValue()).max),
                        Some(nulls)))
                    case BooleanType =>
                      Some(fl.name -> ColStats(dt,
                        Some(mins.map(_.asInstanceOf[java.lang.Boolean]
                          .booleanValue()).min),
                        Some(maxs.map(_.asInstanceOf[java.lang.Boolean]
                          .booleanValue()).max), Some(nulls)))
                    case StringType =>
                      val mn = mins.map(
                        _.asInstanceOf[org.apache.parquet.io.api.Binary]
                          .getBytes).reduce((a, b) => if (cmpU(a, b) <= 0) a else b)
                      val mx = maxs.map(
                        _.asInstanceOf[org.apache.parquet.io.api.Binary]
                          .getBytes).reduce((a, b) => if (cmpU(a, b) >= 0) a else b)
                      val mnS = new String(mn, java.nio.charset.StandardCharsets.UTF_8)
                      val mxS = new String(mx, java.nio.charset.StandardCharsets.UTF_8)
                      // bound manifest bytes like the scan's longest-value
                      // rule; divergence documented above
                      if (mnS.codePointCount(0, mnS.length) > MaxStatsStringLen ||
                          mxS.codePointCount(0, mxS.length) > MaxStatsStringLen)
                        None
                      else Some(fl.name ->
                        ColStats(dt, Some(mnS), Some(mxS), Some(nulls)))
                    case _ => None
                  }
                }
              }
            }.toMap
            Some(f -> FileStats(rows, cols, bytes = sizes.getOrElse(f, 0L)))
          }
        } finally rd.close()
      }.toMap
      Some(out)
    } catch {
      case scala.util.control.NonFatal(e) =>
        graft.observability.Observability.logLeveled(
          graft.observability.Observability.Level.Warning,
          s"footer stats unavailable (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}) — falling back to the scan pass")
        None
    }
  }

  private[storage] def collectStats(df: DataFrame, files: Seq[String],
                                    sizes: Map[String, Long],
                                    bloomCols: Seq[String] = Seq.empty,
                                    sidecarDir: Option[String] = None)
      : Map[String, FileStats] = {
    if (files.isEmpty) return Map.empty
    val statCols = df.schema.fields.filter(f => statsSupported(f.dataType))
      .take(MaxStatsColumns).toSeq
    // declared bloom columns present in this commit's schema at a
    // supported type; a declared-but-absent column simply records none
    val bCols = bloomCols.flatMap(c => df.schema.fields.find(f =>
      f.name.equalsIgnoreCase(c) && bloomSupported(f.dataType)))
    // backquoted references: a column name carrying a dot (legal via
    // backticks) must resolve as ONE column here, not a nested path
    def ref(n: String): Column = col(s"`$n`")
    val bloomAggs = bCols.map { f =>
      import org.apache.spark.sql.catalyst.expressions.{Literal => CLit, XxHash64}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      org.apache.spark.sql.graft.ColumnBridge.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(org.apache.spark.sql.graft.ColumnBridge
            .expression(ref(f.name)))),
          CLit(BloomEstItems), CLit(BloomNumBits)).toAggregateExpression())
        .as(s"__bloom_${f.name}")
    }
    val aggs = (count(lit(1)).as("__rows") +: statCols.flatMap { f =>
      Seq(min(ref(f.name)).as(s"__min_${f.name}"),
        max(ref(f.name)).as(s"__max_${f.name}"),
        count(when(ref(f.name).isNull, 1)).as(s"__nulls_${f.name}")) ++
        (if (f.dataType == StringType)
          Seq(max(length(ref(f.name))).as(s"__len_${f.name}")) else Seq.empty)
    }) ++ bloomAggs
    val rows = df.groupBy(input_file_name().as("__path"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: one row per newly written file
    val bloomBits = scala.collection.mutable.Map
      .empty[String, Seq[(String, String, Array[Byte])]]
    val byKey = rows.map { r =>
      var i = 2
      val cols = statCols.flatMap { f =>
        val (mn, mx) = (statValue(r.get(i)), statValue(r.get(i + 1)))
        val nulls = r.getLong(i + 2)
        i += 3
        val keep =
          if (f.dataType == StringType) {
            val maxLen = Option(r.get(i)).map(_.asInstanceOf[Number].intValue())
            i += 1
            maxLen.forall(_ <= MaxStatsStringLen)
          } else true
        if (keep)
          Some(f.name -> ColStats(f.dataType.simpleString, mn, mx, Some(nulls)))
        else None
      }.toMap
      val bits = bCols.flatMap { f =>
        val v = r.get(i)
        i += 1
        Option(v).map(b => (f.name, f.dataType.simpleString,
          b.asInstanceOf[Array[Byte]]))
      }
      val key = pathKey(r.getString(0))
      if (bits.nonEmpty) bloomBits(key) = bits
      key -> FileStats(r.getLong(1), cols)
    }.toMap
    // bloom bits → the commit's parquet sidecar; the stats carry only a
    // (sidecar path, ord) pointer and the collected bits are dropped.
    // Ords assign in `files` order (deterministic across commit-loop
    // retries — a rival reading our torn state can never see them).
    val bloomRefs = scala.collection.mutable.Map.empty[String, Map[String, BloomStats]]
    sidecarDir match {
      case Some(sc) if bloomBits.nonEmpty =>
        val sidecarRows = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.Row]
        var ord = 0L
        files.foreach { f =>
          val key = pathKey(f)
          bloomBits.get(key).foreach { entries =>
            bloomRefs(key) = entries.sortBy(_._1).map { case (c, t, bits) =>
              sidecarRows += org.apache.spark.sql.Row(ord, f, c, t, bits)
              val bs = BloomStats(t, "", Some(sc), ord)
              ord += 1
              c -> bs
            }.toMap
          }
        }
        val spark = df.sparkSession
        val parts = math.max(1,
          (sidecarRows.size + CkptRowsPerPart - 1) / CkptRowsPerPart)
        spark.createDataFrame(
          spark.sparkContext.parallelize(sidecarRows.toSeq, parts),
          BloomSidecarSchema).write.mode(SaveMode.Overwrite).parquet(sc)
      case _ => // inline legacy form (external-layout conversion)
        bloomBits.foreach { case (key, entries) =>
          bloomRefs(key) = entries.map { case (c, t, bits) =>
            c -> BloomStats(t,
              java.util.Base64.getEncoder.encodeToString(bits))
          }.toMap
        }
    }
    files.flatMap(f => byKey.get(pathKey(f))
      .map(st => f -> st.copy(bytes = sizes.getOrElse(f, 0L),
        blooms = bloomRefs.getOrElse(pathKey(f), Map.empty)))).toMap
  }

  /** The shared two-phase commit: `write` materializes data files into
    * the fresh version directory, then the manifest appears atomically.
    * Split out so maintenance rewrites ([[compact]], [[cluster]]) share
    * the exact protocol — the crash contract cannot drift per operation.
    *
    * Crash/concurrency ergonomics (round 14):
    *  - an EXISTING data dir for the target version is an orphan iff its
    *    version has no committed manifest (ours is latest+1, so always);
    *    it is reclaimed unattended when older than `reclaimGraceMs`
    *    (crash recovery), refused loudly when younger (a live rival may
    *    own it — the round-13 contract, now time-bounded);
    *  - a LOST manifest rename (rival committed our version first)
    *    triggers a bounded optimistic retry: our uncommitted data dir is
    *    deleted, the next free version is claimed, and `write` runs
    *    again — so interleaved committers serialize with every commit
    *    landing. `write` may therefore run more than once.
    */
  private[storage] def commitFiles(spark: SparkSession, dir: String,
                                   operation: String,
                                   carryFrom: Boolean = false,
                                   reclaimGraceMs: Long = DefaultReclaimGraceMs)
                                  (write: String => Unit): Long =
    commitStaged(spark, dir, operation, reclaimGraceMs) { (prior, dataDir) =>
      write(dataDir)
      if (carryFrom) prior.map(m => (m.files, m.stats))
        .getOrElse((Seq.empty, Map.empty))
      else (Seq.empty, Map.empty)
    }

  /** Additive schema union: every carried column keeps its type (a type
    * CHANGE refuses loudly — rewrite via a full-snapshot [[commit]]);
    * columns only the new files carry append at the end. Nullability is
    * erased (parquet reads are nullable anyway). */
  private def asNullableType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullableType(f.dataType), nullable = true)))
    case a: ArrayType =>
      a.copy(elementType = asNullableType(a.elementType), containsNull = true)
    case m: MapType => m.copy(keyType = asNullableType(m.keyType),
      valueType = asNullableType(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def asNullableSchema(s: StructType): StructType =
    asNullableType(s).asInstanceOf[StructType]

  /** Additive union resolving names by the SESSION's case sensitivity
    * (Spark analysis and `unionByName` are case-insensitive under the
    * default `spark.sql.caseSensitive=false`): a delta that re-spells a
    * committed column (`Lang` vs `lang`) matches the EXISTING column —
    * committed spelling wins, Delta's name normalization — instead of
    * committing a union schema holding both spellings that every later
    * explicit-schema read would refuse as a duplicate column. A delta
    * whose OWN columns collide case-only refuses loudly. */
  /** The safe TYPE-WIDENING lattice (round 18 — the Delta type-widening
    * shape): conversions the parquet reader performs losslessly when the
    * requested schema is wider than the file's native type (verified
    * against Spark 4's vectorized reader: int32→int64, float→double,
    * decimal scale/precision growth), so a widening is a METADATA-ONLY
    * commit — zero file rewrites, pre-widening files upcast at read.
    * Strict (`from != to`); nested types stay refused (conservative). */
  private[storage] def widens(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (a: DecimalType, b: DecimalType) =>
        (a.precision, a.scale) != (b.precision, b.scale) &&
          b.scale >= a.scale &&
          b.precision - b.scale >= a.precision - a.scale
      case _ => false
    }

  /** `ALTER TABLE <t> ALTER COLUMN <name> TYPE <newType>` — a pure
    * metadata `alter-column-type` commit: the committed logical schema
    * records the WIDENED type, retained data files keep their native
    * (narrower) parquet types and upcast at read (the explicit-schema
    * parquet scan — pinned by [[widens]]' lattice), and later appends
    * may arrive at either width ([[mergeSchemas]] accepts
    * narrower-if-widenable). Per-file stats comparisons stay exact: each
    * file's [[ColStats]] carries its OWN recorded type, integral stats
    * are stored as Long at any width, and decimal stats re-materialize
    * at the file's recorded scale — so pruning across mixed-width files
    * needs no migration. Refusals (unknown column, partition column —
    * its type pins the hive path re-read — or a non-widening change)
    * are typed [[refuse]] errors. */
  def alterColumnType(spark: SparkSession, dir: String, name: String,
                      newType: DataType,
                      reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(latestVersion(spark, dir).isDefined,
      s"no committed version at $dir")
    val cs = caseSensitive(spark)
    def same(a: String, b: String) = if (cs) a == b else a.equalsIgnoreCase(b)
    def widenedSchema(prior: Option[Manifest]): StructType = {
      val m0 = prior.getOrElse(refuse(s"no committed version at $dir"))
      val schema0 = m0.schemaStruct.getOrElse(
        asNullableSchema(spark.read.parquet(m0.files: _*).schema))
      val idx = schema0.fields.indexWhere(f => same(f.name, name))
      if (idx < 0) refuse(
        s"column $name does not exist — ALTER COLUMN TYPE takes a " +
          "committed column")
      val f0 = schema0.fields(idx)
      if (m0.partitionCols.exists(same(_, f0.name))) refuse(
        s"column ${f0.name} is a PARTITION column — its values re-type " +
          "from the hive col=value layout; widening it needs a " +
          "full-snapshot rewrite")
      if (f0.dataType == newType) refuse(
        s"column ${f0.name} is already of type ${newType.simpleString}")
      if (!widens(f0.dataType, newType)) refuse(
        s"cannot change column ${f0.name} from " +
          s"${f0.dataType.simpleString} to ${newType.simpleString} — only " +
          "safe widenings (byte/short/int->long chain, float->double, " +
          "decimal scale/precision growth) are metadata-only; anything " +
          "else needs a full-snapshot rewrite")
      StructType(schema0.fields.updated(idx, f0.copy(dataType = newType)))
    }
    widenedSchema(Some(manifest(spark, dir,
      latestVersion(spark, dir).get))) // fail fast, before any staging
    commitStagedFull(spark, dir, "alter-column-type", reclaimGraceMs,
      schemaOverrideFn = Some(widenedSchema _)) { (prior, _) =>
      val m = prior.getOrElse(refuse(s"no committed version at $dir"))
      Staged(m.files, m.stats) // pure metadata — everything carries
    }
  }

  private[storage] def mergeSchemas(base: StructType, add: StructType,
                                    caseSensitive: Boolean,
                                    droppedPhysical: Set[String] =
                                      Set.empty): StructType = {
    val b = asNullableSchema(base); val a = asNullableSchema(add)
    def key(n: String): String =
      if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    a.fields.groupBy(f => key(f.name)).foreach { case (_, fs) =>
      if (fs.length > 1) sys.error(
        s"schema evolution conflict: columns ${fs.map(_.name).mkString(", ")} " +
          "collide under the session's case-insensitive resolution " +
          "(spark.sql.caseSensitive=false) — no committed version could read")
    }
    val baseKeys = b.fields.map(f => key(f.name)).toSet
    val kept = b.fields.map { f =>
      a.fields.find(g => key(g.name) == key(f.name)).foreach { g =>
        // NARROWER incoming data is accepted when the committed type
        // WIDENS it (round 18): the file keeps its native parquet type
        // and every read upcasts to the committed logical type — the
        // exact shape ALTER COLUMN TYPE leaves pre-widening files in.
        // A WIDER incoming type still refuses: silently widening the
        // table on append would be an implicit DDL (run ALTER TABLE
        // ALTER COLUMN c TYPE first).
        if (g.dataType != f.dataType && !widens(g.dataType, f.dataType))
          sys.error(
            s"schema evolution conflict on column ${f.name}: committed " +
              s"${f.dataType.simpleString} vs new ${g.dataType.simpleString}" +
              " — widen the table first (ALTER TABLE ... ALTER COLUMN ... " +
              "TYPE) or full-snapshot commit for anything else")
      }
      f
    }
    val appended = a.fields.filterNot(g => baseKeys(key(g.name)))
    // column mapping: a NEW column's PHYSICAL name must not collide with
    // an existing column's PHYSICAL name (duplicate parquet fields — no
    // file could read) nor with a TOMBSTONED dropped column (retained
    // files still carry those bytes — they would silently resurrect;
    // ALTER TABLE ADD COLUMNS re-adds such names under a FRESH physical)
    val basePhysical = b.fields.map(f => key(physicalName(f))).toSet
    val droppedKeys = droppedPhysical.map(key)
    appended.foreach { g =>
      val gp = key(physicalName(g))
      if (basePhysical(gp)) sys.error(
        s"schema evolution conflict: new column ${g.name} collides with the " +
          "PHYSICAL name of a renamed column — pick another name (the " +
          "physical schema would hold duplicate parquet fields)")
      if (droppedKeys(gp)) sys.error(
        s"schema evolution conflict: new column ${g.name} collides with a " +
          "DROPPED column's physical name — retained files still carry " +
          "those bytes; re-add it through ALTER TABLE ADD COLUMNS (which " +
          "assigns a fresh physical name)")
    }
    // …and appended fields must not collide with EACH OTHER physically
    appended.groupBy(g => key(physicalName(g))).foreach { case (_, gs) =>
      if (gs.length > 1) sys.error(
        s"schema evolution conflict: new columns ${gs.map(_.name).mkString(", ")} " +
          "share one physical parquet name — no file could carry both")
    }
    StructType(kept ++ appended)
  }

  /** The version's logical schema: carried schema (stored, or inferred
    * once for pre-evolution manifests) unioned with the new files'. */
  /** `carriedNonEmpty` (round 20): a BOUNDED carry-all commit carries
    * every prior file without listing them — the carried schema comes
    * from the header (guaranteed present by the bounded guard). */
  private def versionSchema(spark: SparkSession, prior: Option[Manifest],
                            carryFiles: Seq[String],
                            fresh: Option[StructType],
                            carriedNonEmpty: Boolean = false): StructType = {
    val carried: Option[StructType] =
      if (carryFiles.isEmpty && !carriedNonEmpty) None
      else prior.flatMap(_.schemaStruct)
        .orElse(if (carryFiles.nonEmpty)
          Some(asNullableSchema(spark.read.parquet(carryFiles: _*).schema))
        else None)
    (carried, fresh) match {
      case (Some(c), Some(n)) => mergeSchemas(c, n, caseSensitive(spark),
        prior.map(_.droppedCols.toSet).getOrElse(Set.empty))
      case (c, n) => c.orElse(n).getOrElse(new StructType())
    }
  }

  /** What one staged commit carries and creates: the prior files (with
    * stats) the new version KEEPS, and the new version's deletion-vector
    * map. `dvs = None` (the default for every 2-tuple [[commitStaged]]
    * caller) derives the map from the prior manifest by CARRY: a carried
    * file keeps its vector, a rewritten or fresh file has none — exactly
    * right for append (all carried), CoW mutation (touched files
    * materialize their vectors in the rewrite), and maintenance rewrites
    * (nothing carried → no vectors). Explicit `Some(...)` is for the
    * operations whose vectors do NOT derive from the prior manifest:
    * [[deleteWhereDv]] (adds vectors), [[restore]]/[[cloneTable]]
    * (another manifest's vectors). */
  /** `removes` (round 20, BOUNDED stages only): prior files this commit
    * DROPS — the carry-all-except encoding of a CoW rewrite, rendered
    * straight into the action delta so the untouched file list never
    * materializes. Eager stages express removal by omission from
    * `carryFiles` instead and must leave this empty. */
  private[storage] final case class Staged(
      carryFiles: Seq[String], carryStats: Map[String, FileStats],
      dvs: Option[Map[String, DvRef]] = None,
      removes: Seq[String] = Seq.empty)

  /** file ENTRIES the most recent commit on THIS thread materialized
    * driver-side (carried + new for eager stages; new only for bounded
    * carry-all appends) — the round-20 bounded-residency fence */
  private val lastCommitDriverEntriesTl =
    ThreadLocal.withInitial[Long](() => -1L)
  private[storage] def lastCommitDriverEntries: Long =
    lastCommitDriverEntriesTl.get()
  private def setLastCommitDriverEntries(n: Long): Unit =
    lastCommitDriverEntriesTl.set(n)

  /** Back-compat shape of [[commitStagedFull]] for the carry-derived-dv
    * callers. */
  private[storage] def commitStaged(spark: SparkSession, dir: String,
                                    operation: String,
                                    reclaimGraceMs: Long = DefaultReclaimGraceMs,
                                    partitionBy: Option[Seq[String]] = None,
                                    partitionTypeHint: Map[String, DataType] =
                                      Map.empty,
                                    schemaOverride: Option[StructType] = None,
                                    bloomColsOpt: Option[Seq[String]] = None,
                                    freshArePhysical: Boolean = true,
                                    droppedColsFn:
                                      Option[Option[Manifest] => Seq[String]] =
                                        None,
                                    tblProperties: Map[String, String] =
                                      Map.empty)
                                   (stage: (Option[Manifest], String) =>
                                     (Seq[String], Map[String, FileStats])): Long =
    commitStagedFull(spark, dir, operation, reclaimGraceMs, partitionBy,
      partitionTypeHint, schemaOverride, bloomColsOpt, freshArePhysical,
      droppedColsFn = droppedColsFn,
      propertiesFn =
        if (tblProperties.isEmpty) None
        else Some(p => p.map(_.properties).getOrElse(Map.empty) ++
          tblProperties)) {
      (prior, dataDir) =>
        val (f, s) = stage(prior, dataDir)
        Staged(f, s)
    }

  /** The fully general commit: `stage(priorManifest, dataDir)` writes the
    * new version's NEW data files into `dataDir` and returns which of the
    * prior version's files (with their stats) the new version CARRIES —
    * the shape row-grain copy-on-write ([[deleteWhere]], [[merge]]) needs,
    * where the carried set is the prior files the operation did NOT have
    * to rewrite. `stage` receives the prior manifest read INSIDE the
    * retry loop, so a lost-race retry recomputes its file selection
    * against the rival's committed state, never a stale view. */
  /** `freshArePhysical` (column mapping): true for every stage whose
    * fresh files were written through [[writeData]]'s logical→physical
    * translation (all carry-style and maintenance commits) — their
    * parquet spellings translate back to the carried logical names for
    * the schema union; false for a layout-REDEFINING full snapshot,
    * whose frame's own names are the new authority (a user reintroducing
    * a column spelled like an old physical name must get exactly that
    * name, not a resurrected mapping). */
  /** `schemaOverride` records a FIXED schema (restore/clone — the target
    * manifest's own, correct regardless of rival evolution);
    * `schemaOverrideFn` recomputes from the IN-LOOP prior (metadata-only
    * DDL — a lost-race retry must fold a rival's concurrent schema
    * evolution in, never commit a stale view; the function may refuse,
    * and refusals reclaim the staged dir like any stage failure). */
  private[storage] def commitStagedFull(spark: SparkSession, dir: String,
                                    operation: String,
                                    reclaimGraceMs: Long = DefaultReclaimGraceMs,
                                    partitionBy: Option[Seq[String]] = None,
                                    partitionTypeHint: Map[String, DataType] =
                                      Map.empty,
                                    schemaOverride: Option[StructType] = None,
                                    bloomColsOpt: Option[Seq[String]] = None,
                                    freshArePhysical: Boolean = true,
                                    schemaOverrideFn:
                                      Option[Option[Manifest] => StructType] =
                                        None,
                                    droppedColsFn:
                                      Option[Option[Manifest] => Seq[String]] =
                                        None,
                                    propertiesFn:
                                      Option[Option[Manifest] =>
                                        Map[String, String]] = None,
                                    stageBounded:
                                      Option[(Option[HeaderInfo], String) =>
                                        Staged] = None)
                                   (stage: (Option[Manifest], String) =>
                                     Staged): Long = {
    val f = fs(spark, dir)
    var attempt = 0
    while (true) {
      attempt += 1
      // BOUNDED DRIVER RESIDENCY (round 20): the prior state is read as
      // a HEADER first (one small read — schema, layout, dv map,
      // properties); the full reconstruction is LAZY and a bounded
      // carry-all stage (append faces) never forces it — a commit
      // against an 800k-file table holds O(new files) entries, not the
      // table's. Eager stages (CoW/DV DML, maintenance, restore) force
      // it exactly as before.
      val priorHdr = latestVersion(spark, dir)
        .map(pv => headerInfoOf(spark, dir, pv))
      lazy val priorFull: Option[Manifest] =
        priorHdr.map(h => manifest(spark, dir, h.version))
      // the bounded path needs the carried schema off the header; a
      // legacy no-schema prior falls back to the eager materialization
      val bounded = stageBounded.isDefined &&
        priorHdr.forall(_.schema.isDefined)
      // header-grain manifest view for the fn hooks of BOUNDED commits
      // (they read properties/schema/droppedCols only — never files)
      def hdrLite: Option[Manifest] = priorHdr.map(h =>
        Manifest(h.version, h.operation, Seq.empty, Map.empty, h.schema,
          h.partitionCols, h.ts, h.bloomCols, h.dvs, h.droppedCols,
          h.properties))
      // full-snapshot commits may (re)define the partition layout;
      // carry-style commits (append/merge/delete/maintenance) inherit it
      val pCols = partitionBy
        .getOrElse(priorHdr.map(_.partitionCols).getOrElse(Seq.empty))
      // declared bloom columns follow the same (re)define-or-inherit rule
      val bCols = bloomColsOpt
        .getOrElse(priorHdr.map(_.bloomCols).getOrElse(Seq.empty))
      val v = priorHdr.map(_.version).getOrElse(0L) + 1
      onAttemptForTest(operation, v)
      val dataDir = f"$dir/data/v$v%08d-$operation"
      val dataPath = new Path(dataDir)
      if (f.exists(dataPath)) {
        // v = latest+1 has no committed manifest, so this dir is a torn
        // commit's orphan — unless a LIVE writer is mid-commit on it,
        // which the grace horizon bounds
        val age = System.currentTimeMillis() -
          f.getFileStatus(dataPath).getModificationTime
        require(age >= reclaimGraceMs,
          s"$dataDir already exists and is ${age}ms old (< grace " +
            s"$reclaimGraceMs ms) — a concurrent or crashed commit owns it; " +
            "an older orphan would be reclaimed unattended")
        f.delete(dataPath, true)
      }
      // Failures in staging or schema/stats derivation (a half-written
      // data dir, a schema-evolution type conflict, a commit that wrote
      // no files at all) reclaim OUR data dir before rethrowing —
      // otherwise the writer's own refused commit would wedge its retry
      // behind the grace horizon. The claim contracts stay intact: the
      // staged-manifest refusal below is OUTSIDE this scope, so a LOST
      // race still leaves rival artifacts untouched.
      val m = try {
        val fnPrior: Option[Manifest] = if (bounded) hdrLite else priorFull
        val staged0 = stageBounded match {
          case Some(fb) if bounded => fb(priorHdr, dataDir)
          case Some(fb) =>
            // legacy no-schema prior: the bounded closure still writes
            // the data (header carries everything it reads); the
            // carry-all intent materializes into explicit carries MINUS
            // the stage's removes — a bounded CoW stage expresses row
            // removal solely via removes, so carrying them here would
            // resurrect deleted rows and duplicate rewritten ones
            val st = fb(priorHdr, dataDir)
            val rm = st.removes.toSet
            Staged(priorFull.map(_.files.filterNot(rm)).getOrElse(Seq.empty),
              priorFull.map(_.stats -- rm).getOrElse(Map.empty), st.dvs)
          case None => stage(priorFull, dataDir)
        }
        val (carryFiles, carryStats) = (staged0.carryFiles, staged0.carryStats)
        // deletion vectors: explicit, or derived by carry (see [[Staged]]);
        // a bounded carry-all commit keeps EVERY prior ref (the
        // header's) minus its explicit removes
        val dvMap = staged0.dvs.getOrElse {
          if (bounded)
            priorHdr.map(_.dvs).getOrElse(Map.empty) -- staged0.removes
          else {
            val carried = carryFiles.toSet
            priorFull.map(_.dvs.filter(kv => carried(kv._1)))
              .getOrElse(Map.empty)
          }
        }
        val sized = listParquetSized(spark, dataDir)
        val newFiles = sized.map(_._1)
        // layout invariant before the manifest can rename: every fresh
        // file of a partitioned commit must carry its hive segments
        if (pCols.nonEmpty) newFiles.foreach(partitionRawValues(_, pCols))
        // ONE footer read of the fresh files serves schema + stats
        val newDf0 = if (newFiles.isEmpty) None
                     else Some(spark.read.parquet(dataDir))
        // Pin partition column types: hive path inference re-types per
        // commit (a long 0..3 reads back int, an id range that fit int
        // yesterday may infer long today) and a flip would surface as a
        // spurious evolution conflict or a silent value-range trap. The
        // authority is the WRITING frame's type on a layout-(re)defining
        // commit (the hint) and the carried schema on inheriting commits.
        val pinTypes: Map[String, DataType] =
          if (partitionBy.isDefined) partitionTypeHint
          else priorHdr.flatMap(_.schemaStruct) match {
            case Some(ps) if pCols.nonEmpty =>
              val cs = caseSensitive(spark)
              pCols.flatMap(c => ps.fields.find(fl =>
                if (cs) fl.name == c else fl.name.equalsIgnoreCase(c))
                .map(fl => c -> fl.dataType)).toMap
            case _ => Map.empty
          }
        val newDf = newDf0.map(d => pinTypes.foldLeft(d) {
          case (df, (c, t)) => df.withColumn(c, col(c).cast(t))
        })
        // schemaOverride: commits whose carried files come from a manifest
        // OTHER than the prior (restore, shallow clone) must record THAT
        // manifest's schema, not the prior's evolution state.
        // Column mapping: freshly written files spell PHYSICAL names —
        // translate back to the carried logical spelling BEFORE the
        // schema union, or a renamed column would union as a duplicate.
        val logicalByPhysical: Map[String, String] =
          if (!freshArePhysical) Map.empty
          else priorHdr.flatMap(_.schemaStruct).map(ps =>
            ps.fields.iterator.filter(fl => physicalName(fl) != fl.name)
              .map(fl => physicalName(fl) -> fl.name).toMap)
            .getOrElse(Map.empty)
        // physical → logical, resolved by the session's case sensitivity
        // (the file spelling came through writeData's case-aware phys())
        def logicalFor(n: String): Option[String] =
          if (logicalByPhysical.isEmpty) None
          else if (caseSensitive(spark)) logicalByPhysical.get(n)
          else logicalByPhysical.collectFirst {
            case (p, l) if p.equalsIgnoreCase(n) => l
          }
        // A translated field KEEPS its mapping (the file really does
        // spell the physical name — a full rewrite like compact has no
        // carried side to supply it); an untranslated fresh field is
        // STRIPPED of the key: a NEW column must never inherit a stale
        // physical name through an alias's metadata propagation (it
        // would record a mapping no data file satisfies).
        val schema = schemaOverrideFn.map(_(fnPrior)).orElse(schemaOverride)
          .getOrElse(
            versionSchema(spark, fnPrior, carryFiles,
              newDf.map(d => asNullableSchema(StructType(d.schema.fields.map {
                fl => logicalFor(fl.name) match {
                  case Some(logical) => fl.copy(name = logical,
                    metadata = new MetadataBuilder().withMetadata(fl.metadata)
                      .putString(PhysicalNameKey, fl.name).build())
                  case None => fl.copy(
                    metadata = new MetadataBuilder().withMetadata(fl.metadata)
                      .remove(PhysicalNameKey).build())
                }
              }))),
              carriedNonEmpty = bounded && priorHdr.isDefined))
        // monotonized stamp: a clock step backwards (NTP, cross-host
        // skew) must never yield ts <= the prior commit's — the
        // TIMESTAMP AS OF binary search and age-based vacuum both rely
        // on monotone timestamps (the Delta monotonization)
        val tsNow = math.max(System.currentTimeMillis(),
          priorHdr.map(_.ts + 1).getOrElse(1L))
        // dropped-column tombstones carry forward by default; explicit
        // fn for the operations that reset (full snapshot) or append
        // (DROP COLUMN) them — evaluated against the IN-LOOP prior
        val dropped = droppedColsFn.map(_(fnPrior))
          .getOrElse(priorHdr.map(_.droppedCols).getOrElse(Seq.empty))
        // table properties carry forward by default (full snapshots
        // included — governance knobs survive a layout redefine);
        // explicit fn only for the property verbs and table-creating
        // declarations — evaluated against the IN-LOOP prior
        val props = propertiesFn.map(fn => validatedProperties(fn(fnPrior)))
          .getOrElse(priorHdr.map(_.properties).getOrElse(Map.empty))
        // stats ride the footers of the files this commit just wrote —
        // no second data pass (round 21); declared blooms and hive
        // layouts (partition values live in paths, not footers) keep
        // the one-scan path, as does SPARK_GRAFT_STATS_SCAN=1 (the
        // parity-spec control)
        val newStats = newDf.map { d =>
          val viaFooters =
            if (bCols.isEmpty && pCols.isEmpty &&
                !sys.env.contains("SPARK_GRAFT_STATS_SCAN"))
              collectStatsFromFooters(spark, d, newFiles, sized.toMap)
            else None
          viaFooters.getOrElse(collectStats(d, newFiles, sized.toMap,
            bCols, Some(bloomSidecarDirOf(dataDir))))
        }.getOrElse(Map.empty)
        setLastCommitDriverEntries(
          (if (bounded) 0L else carryFiles.size.toLong) + newFiles.size)
        // table-level CHECK constraints (round 18 — Delta invariants)
        // gate EVERY write face at this one choke point: the freshly
        // written files are scanned once and a violating commit refuses
        // BEFORE the manifest can rename (the staged dir reclaims like
        // any stage failure) — append, merge, CoW/DV mutation
        // post-images, SQL INSERT, and the streaming sink all pass
        // through here. Content-neutral rewrites (compact/zorder/purge)
        // skip: they re-encode rows that already passed. Constraints
        // spell LOGICAL column names; fresh files spell physical —
        // alias through the same mapping the schema union used.
        if (!RewriteOps(operation) && constraintsOf(props).nonEmpty)
          newDf.foreach { d =>
            val aliased = d.select(d.columns.toSeq.map(c =>
              col(s"`$c`").as(logicalFor(c).getOrElse(c))): _*)
            // columns of the version schema the fresh files don't carry
            // (evolution null-fill) read as null — and null PASSES a
            // CHECK (SQL semantics), so fill rather than fail to resolve
            val cs = caseSensitive(spark)
            val have = aliased.columns.toSet
            def present(n: String) =
              if (cs) have(n) else have.exists(_.equalsIgnoreCase(n))
            val logical = schema.fields.foldLeft(aliased)((df, fl) =>
              if (present(fl.name)) df
              else df.withColumn(fl.name, lit(null).cast(fl.dataType)))
            validateConstraints(props, logical, operation)
          }
        // ENCODING (round 17): the first commit is self-contained (the
        // base every replay bottoms out on); every later commit logs
        // only its ACTION DELTA — O(changed files) bytes, never
        // O(table files). Eager stages canonicalize the in-memory
        // manifest through the same delta application readers use;
        // BOUNDED carry-all stages (round 20) render the delta
        // DIRECTLY — adds only, removes empty, header carried — so the
        // prior file list never materializes on the driver (the
        // interval checkpoint, when due, reconstructs post-commit).
        // The yield is (rendered log entry, checkpoint interval,
        // manifest thunk for the interval checkpoint).
        if (bounded && priorHdr.isDefined) {
          // a rewrite that drops files and writes none back (a
          // partitioned delete-everything) must not commit an empty
          // table — the one corner that pays a full-state probe
          if (newFiles.isEmpty && staged0.removes.nonEmpty) {
            val removedSet = staged0.removes.toSet
            require(priorFull.exists(_.files.exists(f => !removedSet(f))),
              s"commit of version $v wrote no data files")
          }
          val d = CommitDelta(v, operation, tsNow, Some(schema.json),
            pCols, bCols,
            adds = newFiles.map(fl => fl -> newStats.get(fl)),
            removes = staged0.removes, dvs = dvMap, droppedCols = dropped,
            properties = props)
          (renderDelta(d), checkpointIntervalOfProps(props),
            () => manifest(spark, dir, v))
        } else {
          val staged = Manifest(v, operation, carryFiles ++ newFiles,
            carryStats ++ newStats,
            Some(schema.json), pCols, ts = tsNow,
            bloomCols = bCols, dvs = dvMap, droppedCols = dropped,
            properties = props)
          require(staged.files.nonEmpty,
            s"commit of version $v wrote no data files")
          priorFull match {
            case Some(p0) =>
              val d = deltaOf(staged, p0)
              val applied = applyDelta(p0, d)
              (renderDelta(d), checkpointIntervalOfProps(props),
                () => applied)
            case None =>
              (render(staged), checkpointIntervalOfProps(props),
                () => staged)
          }
        }
      } catch { case e: Throwable =>
        f.delete(dataPath, true)
        throw e
      }
      // COMMIT POINT: one put-if-absent through the pluggable LogStore
      // seam (default: temp write + rename). A crash before the publish
      // leaves only the orphaned data dir + tmp file — invisible.
      val md = new Path(manifestDir(dir))
      if (!f.exists(md)) f.mkdirs(md)
      val fin = manifestPath(dir, v)
      if (logStore.putIfAbsent(f, fin, m._1.getBytes("UTF-8"))) {
        // best-effort full-state checkpoint every checkpoint-interval
        // commits (the `graft.checkpointInterval` table property when
        // set — heavy-commit tables want denser checkpoints, huge-file
        // tables sparser — else [[CheckpointInterval]]) — derived
        // acceleration written AFTER the commit point (a crash here
        // costs the next reader a slightly longer action replay, never
        // a committed version). Reconstruction never assumes a cadence
        // (it walks to the nearest base), so mixed intervals across a
        // table's history are sound by construction.
        if (v % m._2 == 0L)
          try writeCheckpoint(spark, dir, m._3())
          catch { case scala.util.control.NonFatal(_) => () }
        // refresh the checkpoint pointer — a HINT written after the
        // commit point (a crash here only costs the next reader a short
        // forward probe). The commit already knows v, its own operation
        // and batch id, so only the pointer-LAG gap (p.version+1 .. v-1)
        // is read — never the multi-MB manifest just written, and never
        // a full scan on a pointered table. A rival's fresher pointer
        // (version >= v) is left untouched: overwriting it would regress
        // the hint.
        val myBatch = operation match {
          case IngestOp(b) => b.toLong
          case _ => -1L
        }
        readPointer(spark, dir) match {
          case Some(p) if p.version >= v => // a fresher rival owns it
          case Some(p) if manifestExists(spark, dir, p.version) =>
            var acc = p.maxIngestBatch
            var w = p.version + 1
            while (w < v) {
              acc = math.max(acc, commitInfo(spark, dir, w)._1 match {
                case IngestOp(b) => b.toLong
                case _ => -1L
              })
              w += 1
            }
            writePointer(spark, dir, Pointer(v, math.max(acc, myBatch)))
          case _ => // legacy/vacuumed pointer: one full scan seeds it
            val acc = versions(spark, dir).filter(_ < v)
              .foldLeft(-1L)((m0, w) =>
                math.max(m0, commitInfo(spark, dir, w)._1 match {
                  case IngestOp(b) => b.toLong
                  case _ => -1L
                }))
            writePointer(spark, dir, Pointer(v, math.max(acc, myBatch)))
        }
        return v
      }
      // lost: a rival committed version v first. Clean our artifacts and
      // re-claim the next free slot.
      f.delete(dataPath, true)
      // OPTIMISTIC CONFLICT CHECK (round 20 — the Delta ConflictChecker
      // shape over the RenameLogStore atomicity): a lost race normally
      // RE-STAGES against the rival's committed state — full
      // serialization, correct for appends, merges (the CDC-mirror
      // sink's contract), metadata DDL (which folds rival evolution
      // in), and full-snapshot overwrites (last-writer-wins is their
      // semantics). But an engine-staged REWRITE/DML (delete, update,
      // OPTIMIZE, restore) that lost to a rival which itself removed
      // files or changed deletion vectors is a genuine write-write
      // conflict: silently re-running it would hide that the state it
      // was issued against no longer exists. Those refuse TYPED, naming
      // the winning version — the operator re-issues against the new
      // state deliberately. Rival commits that only ADDED files
      // commute: the retry recomputes its file selection against them.
      if (NonCommutingStagedOps(operation)) {
        val newLatest = latestVersion(spark, dir).getOrElse(v)
        def dvsAt(w: Long): Map[String, DvRef] =
          if (w < 1) Map.empty
          else readRaw(spark, dir, w) match {
            case Right(d) => d.dvs
            case Left(mm) => mm.dvs
          }
        val conflicting = (v to newLatest).filter { w =>
          readRaw(spark, dir, w) match {
            case Right(d) => d.removes.nonEmpty || d.dvs != dvsAt(w - 1)
            case Left(_) => true // self-contained full replace
          }
        }
        if (conflicting.nonEmpty)
          throw new SnapshotConcurrentModificationException(
            s"$operation at $dir lost the commit race to version " +
              s"${conflicting.max} (${commitInfo(spark, dir,
                conflicting.max)._1}), which removed files or changed " +
              "deletion vectors — a write-write conflict. Nothing was " +
              "committed and no partial state remains; re-issue the " +
              "operation against the current table state. (Rival commits " +
              "that only append commute and retry automatically.)")
      }
      if (attempt >= MaxCommitAttempts)
        throw new java.io.IOException(
          s"commit of $operation lost the manifest race $attempt times " +
            s"(last at version $v) — giving up; no partial state remains")
    }
    sys.error("unreachable")
  }

  private def listParquet(spark: SparkSession, d: String): Seq[String] =
    listParquetSized(spark, d).map(_._1)

  /** data files with their sizes from the SAME directory listing — sizes
    * reach the manifest without a second per-file RPC. Hidden files AND
    * files under hidden directories (any `_`/`.`-prefixed path segment
    * below `d` — Spark's own convention) are excluded: the version-
    * private `_dv` deletion-vector directory must never list as table
    * data. */
  private def listParquetSized(spark: SparkSession,
                               d: String): Seq[(String, Long)] = {
    val p = new Path(d)
    val f = fs(spark, d)
    if (!f.exists(p)) return Seq.empty // a stage may legally write nothing
    // fully-qualified root: a RELATIVE table dir must not let hidden
    // segments of the cwd's ancestors (e.g. /root/.cache/...) leak into
    // the relative-path check below
    val rootPath = f.makeQualified(p).toUri.getPath
    val it = f.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootPath)
      val hidden = rel.split('/').exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (st.isFile && !hidden)
        buf += ((st.getPath.toString, st.getLen))
    }
    buf.toSeq.sortBy(_._1)
  }

  /** Targeted maintenance commit (round 16 — Delta's `REORG TABLE ...
    * APPLY (PURGE)`): materialize deletion vectors WITHOUT a full
    * compaction — rewrite ONLY the vectored files (vector-applied, so
    * their masked rows drop), CARRY every clean file with its stats.
    * Content-neutral ([[RewriteOps]] — the change feed stays silent),
    * cost O(vectored bytes), and the probe-per-row read overhead of the
    * vectors retires. No vectors = no-op returning the current version.
    * A fully-masked file purges to nothing (its empty rewrite lists with
    * zero rows). */
  def purgeVectors(spark: SparkSession, dir: String,
                   reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    if (manifest(spark, dir, cur).dvs.isEmpty) return cur
    commitStagedFull(spark, dir, "purge", reclaimGraceMs) { (prior, dataDir) =>
      val m = prior.getOrElse(refuse(s"no committed version at $dir"))
      val vectored = m.files.filter(m.dvs.contains)
      val untouchedSet = m.files.toSet -- vectored
      if (vectored.nonEmpty)
        writeData(readFiles(spark, dir, m, vectored), dataDir,
          m.partitionCols, toPhysical = mappingOf(m))
      Staged(m.files.filter(untouchedSet),
        m.stats.filter(kv => untouchedSet(kv._1)), Some(Map.empty))
    }
  }

  /** Maintenance commit: rewrite the LATEST version's data into
    * ~`targetFileBytes` files as a NEW version (operation `compact`).
    * Logical content is identical; readers of prior versions are
    * untouched (their files still exist). */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = -1L,
              reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = read(spark, dir)
    val (bytes, pCols, mapping, target) = {
      val m = manifest(spark, dir, latestVersion(spark, dir).get)
      val f = fs(spark, dir)
      // manifest-recorded sizes when present; RPC only for legacy files
      (m.files.map(p => m.stats.get(p).map(_.bytes).filter(_ > 0L)
        .getOrElse(f.getFileStatus(new Path(p)).getLen)).sum, m.partitionCols,
        mappingOf(m), targetFileBytesOf(m, targetFileBytes))
    }
    val nFiles = math.max(1L, math.ceil(bytes.toDouble / target).toLong)
    commitFiles(spark, dir, "compact", reclaimGraceMs = reclaimGraceMs) {
      dataDir => writeData(cur.repartition(nFiles.toInt), dataDir, pCols,
        toPhysical = mapping)
    }
  }

  /** SCOPED compaction (round 18 — Delta's `OPTIMIZE ... WHERE`):
    * rewrite ONLY the files whose stats might hold rows matching `pred`
    * into ~`targetFileBytes` files and CARRY everything else untouched —
    * the hot-partition maintenance shape: a streaming table's fresh
    * small files compact daily without rewriting the cold 100 TB tail
    * a full [[compact]] would. Content-neutral by construction
    * (rewriting ANY file subset is; the predicate only SELECTS the
    * rewrite set, so conservative stats matching can only widen it —
    * never a wrong answer), committed as a [[RewriteOps]] `compact`
    * excluded from the change feed. The rewrite reads THROUGH the
    * manifest, so the hot files' deletion vectors materialize away
    * exactly as full compaction retires them. A predicate matching
    * nothing is a no-op returning the current version (no empty
    * commit). */
  def compactWhere(spark: SparkSession, dir: String, pred: FilePredicate,
                   targetFileBytes: Long = -1L,
                   reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    if (mightMatchFiles(spark, manifest(spark, dir, cur), Some(pred)).isEmpty)
      return cur // nothing to rewrite
    commitStagedFull(spark, dir, "compact", reclaimGraceMs) {
      (prior, dataDir) =>
        val m = prior.getOrElse(refuse(s"no committed version at $dir"))
        val hot = mightMatchFiles(spark, m, Some(pred))
        val hotSet = hot.toSet
        if (hot.isEmpty) Staged(m.files, m.stats) // raced empty: pure carry
        else {
          val f = fs(spark, dir)
          val bytes = hot.map(p => m.stats.get(p).map(_.bytes)
            .filter(_ > 0L)
            .getOrElse(f.getFileStatus(new Path(p)).getLen)).sum
          val nFiles = math.max(1L, math.ceil(
            bytes.toDouble / targetFileBytesOf(m, targetFileBytes)).toLong)
          writeData(readFiles(spark, dir, m, hot).repartition(nFiles.toInt),
            dataDir, m.partitionCols, toPhysical = mappingOf(m))
          Staged(m.files.filterNot(hotSet),
            m.stats.filter(kv => !hotSet(kv._1)))
        }
    }
  }

  /** SCOPED Z-ORDER (round 19 — Delta's `OPTIMIZE ... WHERE ... ZORDER
    * BY`): re-cluster ONLY the files whose stats might hold rows
    * matching `pred` — the hot partition range — through
    * [[ZOrder.clusterN]], and CARRY every cold file untouched with its
    * stats. The everyday shape on a 100 TB table: yesterday's ingest
    * re-clusters for locality without rewriting the already-clustered
    * cold tail a full [[clusterN]] would (at 800k files, the difference
    * between O(hot bytes) and O(table)). Content-neutral like every
    * rewrite — the predicate only SELECTS the rewrite set, so
    * conservative stats matching can only widen it — committed as a
    * [[RewriteOps]] `zorder` excluded from the change feed; hot files'
    * deletion vectors materialize away in the rewrite. File count sizes
    * from the hot set's recorded bytes at the table's effective target
    * file size. A predicate matching nothing is a no-op returning the
    * current version. */
  def clusterWhere(spark: SparkSession, dir: String, pred: FilePredicate,
                   dims: Seq[String], bits: Int = 16,
                   targetFileBytes: Long = -1L,
                   reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(dims.nonEmpty, "scoped ZORDER needs at least one dimension")
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    if (mightMatchFiles(spark, manifest(spark, dir, cur), Some(pred)).isEmpty)
      return cur // nothing to re-cluster
    commitStagedFull(spark, dir, "zorder", reclaimGraceMs) {
      (prior, dataDir) =>
        val m = prior.getOrElse(refuse(s"no committed version at $dir"))
        val hot = mightMatchFiles(spark, m, Some(pred))
        val hotSet = hot.toSet
        if (hot.isEmpty) Staged(m.files, m.stats) // raced empty: pure carry
        else {
          val f = fs(spark, dir)
          val bytes = hot.map(p => m.stats.get(p).map(_.bytes)
            .filter(_ > 0L)
            .getOrElse(f.getFileStatus(new Path(p)).getLen)).sum
          val nFiles = math.max(1L, math.ceil(
            bytes.toDouble / targetFileBytesOf(m, targetFileBytes)).toLong)
          writeData(
            ZOrder.clusterN(readFiles(spark, dir, m, hot), dims,
              nFiles.toInt, bits),
            dataDir, m.partitionCols, toPhysical = mappingOf(m))
          Staged(m.files.filterNot(hotSet),
            m.stats.filter(kv => !hotSet(kv._1)))
        }
    }
  }

  /** Maintenance commit: [[ZOrder.cluster]] the latest version into a new
    * version (operation `zorder`) — scan locality and time travel in one
    * protocol, and since every commit records per-file min/max stats,
    * the clustered layout immediately pays off through
    * [[readAsOfWhere]]'s file skipping. */
  def cluster(spark: SparkSession, dir: String, xCol: String, yCol: String,
              nFiles: Int, bits: Int = 16,
              reclaimGraceMs: Long = DefaultReclaimGraceMs): Long =
    clusterN(spark, dir, Seq(xCol, yCol), nFiles, bits, reclaimGraceMs)

  /** [[cluster]] across ANY number of dimensions ([[ZOrder.clusterN]]):
    * one write-time layout pass makes the per-file stats selective on
    * every clustered column simultaneously — the (host, lang, length)
    * or (time, shard, quality) layouts a training-data table actually
    * wants. Same `zorder` rewrite commit, same reader-side payoff. */
  def clusterN(spark: SparkSession, dir: String, dims: Seq[String],
               nFiles: Int, bits: Int = 16,
               reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val m0 = latestVersion(spark, dir).map(v => manifest(spark, dir, v))
    val pCols = m0.map(_.partitionCols).getOrElse(Seq.empty)
    commitFiles(spark, dir, "zorder", reclaimGraceMs = reclaimGraceMs) {
      dataDir => writeData(
        ZOrder.clusterN(read(spark, dir), dims, nFiles, bits), dataDir, pCols,
        toPhysical = m0.map(mappingOf).getOrElse(Map.empty))
    }
  }

  /** The commit log as a DataFrame — one row per RETAINED version:
    * (version, operation, n_files, n_rows, n_bytes, n_columns). Rows and
    * bytes sum the manifest's per-file stats (exact for every version
    * this engine committed; legacy entries without stats contribute 0).
    * Driver work is one manifest read per SURFACED version — `limit`
    * (the `DESCRIBE HISTORY ... LIMIT n` operand, matching Delta)
    * restricts to the NEWEST n versions and reads only those, so the
    * 100k-commit streaming table answers a `LIMIT 20` without loading
    * 100k manifests into the driver. */
  def history(spark: SparkSession, dir: String,
              limit: Option[Int] = None): DataFrame = {
    import spark.implicits._
    limit.foreach(n => require(n >= 1, s"LIMIT must be >= 1, got $n"))
    val all = versions(spark, dir)
    val vs = limit.map(n => all.takeRight(n)).getOrElse(all)
    // forward reconstruction: first version pays the walk-back once,
    // each following version is one delta fold — O(surfaced + interval)
    // log reads, never one walk-back per version
    manifestRange(spark, dir, vs).map { m =>
      // live rows = physical rows minus deletion-vector masks
      (m.version, m.operation, m.files.length.toLong,
        m.stats.values.map(_.rows).sum - m.dvs.values.map(_.rows).sum,
        m.stats.values.map(_.bytes).sum,
        m.schemaStruct.map(_.fields.length.toLong).getOrElse(0L),
        m.ts)
    }.toDF("version", "operation", "n_files", "n_rows", "n_bytes",
      "n_columns", "ts_millis")
  }

  /** Maintenance commit: [[Hilbert.cluster]] the latest version into a
    * new version (operation `hilbert`) — the locality upgrade over
    * [[cluster]] (every curve step is distance 1, so file min/max boxes
    * are tighter), through the same commit protocol and the same
    * stats-driven file skipping. */
  def clusterHilbert(spark: SparkSession, dir: String, xCol: String,
                     yCol: String, nFiles: Int, bits: Int = 16,
                     reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val m0 = latestVersion(spark, dir).map(v => manifest(spark, dir, v))
    val pCols = m0.map(_.partitionCols).getOrElse(Seq.empty)
    commitFiles(spark, dir, "hilbert", reclaimGraceMs = reclaimGraceMs) {
      dataDir => writeData(
        Hilbert.cluster(read(spark, dir), xCol, yCol, nFiles, bits),
        dataDir, pCols,
        toPhysical = m0.map(mappingOf).getOrElse(Map.empty))
    }
  }

  /** SQL-grade schema evolution WITHOUT a data rewrite (round 17 —
    * `ALTER TABLE ... ADD COLUMNS`): commit a METADATA-ONLY version
    * (operation `add-columns`) whose schema is the committed schema
    * with `newCols` appended — every data file CARRIES with its stats
    * and vectors, zero bytes move, and pre-evolution files read the new
    * columns as null (the additive contract every read already honors).
    * Refuses an existing or case-colliding column name, and normalizes
    * the new columns nullable (old files MUST null-fill them). The log
    * entry is a pure-header action delta: adds/removes empty, commit
    * bytes O(schema). */
  def addColumns(spark: SparkSession, dir: String,
                 newCols: Seq[StructField],
                 reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(newCols.nonEmpty, "ADD COLUMNS needs at least one column")
    require(latestVersion(spark, dir).isDefined,
      s"no committed version at $dir")
    val cs = caseSensitive(spark)
    // validate + build against the IN-LOOP prior: a lost-race retry must
    // fold a rival's concurrent evolution in, never commit a stale view
    def evolved(prior: Option[Manifest]): StructType = {
      val m0 = prior.getOrElse(refuse(s"no committed version at $dir"))
      val schema0 = m0.schemaStruct.getOrElse(
        asNullableSchema(spark.read.parquet(m0.files: _*).schema))
      def same(a: String, b: String) =
        if (cs) a == b else a.equalsIgnoreCase(b)
      newCols.foreach { f =>
        val clash = schema0.fields.find(g => same(g.name, f.name))
        clash.foreach(g => sys.error(
          s"column ${f.name} already exists as ${g.name} " +
            s"(${g.dataType.simpleString}) — ADD COLUMNS appends new " +
            "columns only"))
      }
      // re-adding a DROPPED name takes a FRESH physical name: retained
      // files still carry the tombstoned physical column, and reading
      // old bytes under the new column would be silent resurrection.
      // The taken set seeds with every sibling's OWN name too and grows
      // as fresh names are assigned — one batch can never mint two
      // fields sharing a physical spelling.
      def key(n: String) = if (cs) n else n.toLowerCase(java.util.Locale.ROOT)
      val taken = scala.collection.mutable.Set.empty[String]
      schema0.fields.foreach { f =>
        taken += key(f.name); taken += key(physicalName(f))
      }
      m0.droppedCols.foreach(taken += key(_))
      newCols.foreach(f => taken += key(f.name))
      def freshPhysical(n: String): String = {
        var i = m0.version + 1
        while (taken(key(s"${n}_r$i"))) i += 1
        val fresh = s"${n}_r$i"
        taken += key(fresh)
        fresh
      }
      val prepared = newCols.map { f =>
        val base = f.copy(nullable = true)
        if (m0.droppedCols.exists(same(_, f.name)))
          base.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(PhysicalNameKey, freshPhysical(f.name)).build())
        else base
      }
      mergeSchemas(schema0, StructType(prepared), cs, m0.droppedCols.toSet)
    }
    evolved(Some(manifest(spark, dir, latestVersion(spark, dir).get))) // fail fast
    commitStagedFull(spark, dir, "add-columns", reclaimGraceMs,
      schemaOverrideFn = Some(evolved _)) { (prior, _) =>
      val m = prior.getOrElse(refuse(s"no committed version at $dir"))
      Staged(m.files, m.stats) // dvs derive by carry — everything carries
    }
  }

  /** `ALTER TABLE ... DROP COLUMN` (round 17 — completing the DDL triad
    * on top of column mapping): a METADATA-ONLY commit (operation
    * `drop-column`) that removes the field from the LOGICAL schema —
    * retained data files keep the physical column as dead bytes until
    * any rewrite (compaction, CoW mutation) naturally retires them
    * (rewrites read the logical schema, so the dropped bytes never
    * copy forward). The dropped PHYSICAL name is TOMBSTONED in the
    * manifest: a later same-named ADD takes a fresh physical name
    * (see [[addColumns]]) instead of silently resurrecting old files'
    * bytes, and implicit append-evolution of a tombstoned name refuses.
    * Refusals: unknown column, PARTITION columns (their values are the
    * layout), and dropping the last data column. A dropped
    * bloom-declared column leaves the declaration (physical names never
    * collide again, and carried files' blooms stay harmless). */
  def dropColumn(spark: SparkSession, dir: String, name: String,
                 reclaimGraceMs: Long = DefaultReclaimGraceMs): Long =
    dropColumns(spark, dir, Seq(name), reclaimGraceMs)

  /** [[dropColumn]] over a COLUMN LIST, as ONE metadata commit — `ALTER
    * TABLE t DROP COLUMNS (a, b)` must be all-or-nothing: with one
    * commit per column, a concurrent writer dropping/renaming a
    * mid-list column would refuse the rest AFTER earlier columns
    * already committed — a partially-applied DDL no reader asked for.
    * All names resolve against the IN-LOOP prior, all fields leave the
    * schema together, and every dropped physical name tombstones in the
    * same commit. */
  def dropColumns(spark: SparkSession, dir: String, names: Seq[String],
                  reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(names.nonEmpty, "DROP COLUMNS needs at least one column")
    require(latestVersion(spark, dir).isDefined,
      s"no committed version at $dir")
    val cs = caseSensitive(spark)
    def same(a: String, b: String) = if (cs) a == b else a.equalsIgnoreCase(b)
    // resolver-level dedup: DROP COLUMNS (a, A) names one column
    val unique = names.foldLeft(Vector.empty[String])((acc, n) =>
      if (acc.exists(same(_, n))) acc else acc :+ n)
    def resolve(prior: Option[Manifest]): (StructType, Seq[StructField]) = {
      val m0 = prior.getOrElse(refuse(s"no committed version at $dir"))
      val schema0 = m0.schemaStruct.getOrElse(
        asNullableSchema(spark.read.parquet(m0.files: _*).schema))
      val dropped = unique.map { n =>
        val f0 = schema0.fields.find(f => same(f.name, n)).getOrElse(
          sys.error(s"column $n does not exist — DROP COLUMN takes a " +
            "committed column"))
        require(!m0.partitionCols.exists(same(_, f0.name)),
          s"column ${f0.name} is a PARTITION column — dropping it needs a " +
            "full-snapshot rewrite")
        val refd = constraintsReferencing(spark, m0.properties, f0.name)
        if (refd.nonEmpty) refuse(
          s"column ${f0.name} is referenced by CHECK constraint(s) / " +
            s"expression default(s) ${refd.mkString(", ")} — retire " +
            "them first (dropping under them would wedge every later write)")
        f0
      }
      require(dropped.length < schema0.fields.length,
        "cannot drop the table's last column")
      (StructType(schema0.fields.filterNot(f =>
        dropped.exists(d => same(d.name, f.name)))), dropped)
    }
    resolve(Some(manifest(spark, dir,
      latestVersion(spark, dir).get))) // fail fast, before any staging
    commitStagedFull(spark, dir, "drop-column", reclaimGraceMs,
      schemaOverrideFn = Some(p => resolve(p)._1),
      droppedColsFn = Some { p =>
        val m0 = p.getOrElse(refuse(s"no committed version at $dir"))
        resolve(p)._2.map(physicalName).foldLeft(m0.droppedCols) {
          (acc, phys) =>
            if (acc.exists(same(_, phys))) acc else acc :+ phys
        }
      }) { (prior, _) =>
      val m = prior.getOrElse(refuse(s"no committed version at $dir"))
      Staged(m.files, m.stats) // pure metadata — everything carries
    }
  }

  /** `ALTER TABLE ... RENAME COLUMN` survival (round 17 — Delta's
    * name-mode COLUMN MAPPING): a metadata-only commit (operation
    * `rename-column`) that renames the LOGICAL column while the field's
    * metadata pins its PHYSICAL name — the name every committed parquet
    * file (and every per-file stat and bloom) already carries and every
    * FUTURE file keeps spelling ([[writeData]] translates at its one
    * choke point). Zero data bytes move; old versions keep reading
    * under their own recorded names (time travel across the rename is
    * exact); stats pruning keeps firing on the renamed column (every
    * skipping site translates logical → physical through
    * [[toPhysicalPred]]). Refusals: unknown column, occupied/case-
    * colliding target, and PARTITION columns (their values live in the
    * physical `col=value` path layout — rewrite via a full-snapshot
    * commit instead). */
  def renameColumn(spark: SparkSession, dir: String,
                   oldName: String, newName: String,
                   reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(latestVersion(spark, dir).isDefined,
      s"no committed version at $dir")
    val cs = caseSensitive(spark)
    def same(a: String, b: String) = if (cs) a == b else a.equalsIgnoreCase(b)
    // validate + build against the IN-LOOP prior (see [[addColumns]])
    def renamedSchema(prior: Option[Manifest]): StructType = {
      val m0 = prior.getOrElse(refuse(s"no committed version at $dir"))
      val schema0 = m0.schemaStruct.getOrElse(
        asNullableSchema(spark.read.parquet(m0.files: _*).schema))
      val idx = schema0.fields.indexWhere(f => same(f.name, oldName))
      require(idx >= 0,
        s"column $oldName does not exist — RENAME COLUMN takes a committed " +
          "column")
      val f0 = schema0.fields(idx)
      require(!m0.partitionCols.exists(same(_, f0.name)),
        s"column ${f0.name} is a PARTITION column — its values live in the " +
          "physical col=value layout; renaming it needs a full-snapshot " +
          "rewrite")
      require(!schema0.fields.zipWithIndex.exists { case (g, i) =>
        i != idx && same(g.name, newName) },
        s"column $newName already exists — RENAME COLUMN cannot collide")
      val refd = constraintsReferencing(spark, m0.properties, f0.name)
      if (refd.nonEmpty) refuse(
        s"column ${f0.name} is referenced by CHECK constraint(s) / " +
          s"expression default(s) ${refd.mkString(", ")} — retire " +
          "them first (renaming under them would wedge every later write)")
      val renamed = f0.copy(name = newName,
        metadata = new MetadataBuilder().withMetadata(f0.metadata)
          .putString(PhysicalNameKey, physicalName(f0)).build())
      StructType(schema0.fields.updated(idx, renamed))
    }
    renamedSchema(Some(manifest(spark, dir,
      latestVersion(spark, dir).get))) // fail fast, before any staging
    commitStagedFull(spark, dir, "rename-column", reclaimGraceMs,
      schemaOverrideFn = Some(renamedSchema _)) { (prior, _) =>
      val m = prior.getOrElse(refuse(s"no committed version at $dir"))
      Staged(m.files, m.stats) // pure metadata — everything carries
    }
  }

  // ------------------------------------------ table properties (round 18)

  /** Keys under the engine's own `graft.` namespace that a table may
    * set. Everything else under `graft.` refuses loudly (a typo'd knob
    * must never silently no-op — the Delta `delta.`-prefix discipline);
    * non-graft keys are opaque user metadata. */
  private val ConstraintKeyPrefix = "graft.constraints."
  private[storage] val BloomColumnsKey = "graft.bloomColumns"
  private[storage] val CheckpointIntervalKey = "graft.checkpointInterval"
  private[storage] val TargetFileSizeKey = "graft.targetFileSize"
  private[storage] val CdfKeysKey = "graft.cdfKeys"
  private val GeneratedKeyPrefix = "graft.generated."
  private val IdentityKeyPrefix = "graft.identity."
  private val IdentityHighWaterPrefix = "graft.identityHighWater."

  /** typed refusal of table-property and constraint validation — the
    * same class the SQL face surfaces, so programmatic callers catch
    * one thing */
  final class SnapshotPropertyException(msg: String)
      extends RuntimeException(msg)

  /** Refusal of a table-level CHECK constraint at a write: the commit
    * was aborted, no version landed, the staged files are reclaimed. */
  final class ConstraintViolationException(msg: String)
      extends RuntimeException(msg)

  /** Validate and CANONICALIZE a property map: `graft.*` keys resolve
    * case-insensitively to their canonical spelling (so a lowercased
    * `graft.bloomcolumns` lands as one key, never a shadow duplicate),
    * unknown `graft.*` keys refuse (a typo'd knob must never silently
    * no-op), known knobs' values type-check, and non-graft keys pass
    * through verbatim as opaque user metadata. Constraint NAMES keep
    * their case. */
  private def validatedProperties(props: Map[String, String])
      : Map[String, String] =
    props.map { case (k, v) =>
      val lk = k.toLowerCase(java.util.Locale.ROOT)
      if (!lk.startsWith("graft.")) k -> v
      else if (lk == CheckpointIntervalKey.toLowerCase(java.util.Locale.ROOT)) {
        val ok = try v.trim.toLong >= 1L
        catch { case _: NumberFormatException => false }
        if (!ok) throw new SnapshotPropertyException(
          s"$CheckpointIntervalKey must be a positive integer, got '$v'")
        CheckpointIntervalKey -> v
      } else if (lk == BloomColumnsKey.toLowerCase(java.util.Locale.ROOT)) {
        if (v.split(',').map(_.trim).forall(_.isEmpty))
          throw new SnapshotPropertyException(
            s"$BloomColumnsKey needs a comma-separated column list, got '$v'")
        BloomColumnsKey -> v
      } else if (lk == CdfKeysKey.toLowerCase(java.util.Locale.ROOT)) {
        // the row-grain change feed's KEY declaration (round 19): what
        // SQL `table_changes` and the streaming CDF source join the two
        // boundary snapshots on when no explicit idCols are passed
        if (v.split(',').map(_.trim).forall(_.isEmpty))
          throw new SnapshotPropertyException(
            s"$CdfKeysKey needs a comma-separated key column list, got '$v'")
        CdfKeysKey -> v
      } else if (lk == TargetFileSizeKey.toLowerCase(java.util.Locale.ROOT)) {
        // bytes; a sub-1 KB target can only be a typo'd unit (someone
        // meant MB) and would shred every OPTIMIZE into a metadata storm
        val ok = try v.trim.toLong >= 1024L
        catch { case _: NumberFormatException => false }
        if (!ok) throw new SnapshotPropertyException(
          s"$TargetFileSizeKey must be a byte count >= 1024, got '$v'")
        TargetFileSizeKey -> v
      } else if (lk.startsWith(ConstraintKeyPrefix)) {
        if (k.length == ConstraintKeyPrefix.length || v.trim.isEmpty)
          throw new SnapshotPropertyException(
            s"constraint property $k needs a name and a CHECK expression")
        (ConstraintKeyPrefix + k.substring(ConstraintKeyPrefix.length)) -> v
      } else if (lk.startsWith(IdentityHighWaterPrefix
          .toLowerCase(java.util.Locale.ROOT))) {
        // INTERNAL: the next value the identity column allocates —
        // written by allocating commits through the same carried map,
        // validated here because every propertiesFn output revalidates
        val ok = try { v.trim.toLong; true }
        catch { case _: NumberFormatException => false }
        if (!ok) throw new SnapshotPropertyException(
          s"identity high-water property $k must be an integer, got '$v'")
        (IdentityHighWaterPrefix +
          k.substring(IdentityHighWaterPrefix.length)) -> v
      } else if (lk.startsWith(IdentityKeyPrefix
          .toLowerCase(java.util.Locale.ROOT))) {
        // GENERATED ALWAYS AS IDENTITY (round 20): '<start>,<step>'
        // (or a bare '<start>', step 1). Writers must OMIT the column;
        // allocating commits assign monotonic non-reused values.
        if (k.length == IdentityKeyPrefix.length ||
            parseIdentitySpec(v).isEmpty)
          throw new SnapshotPropertyException(
            s"identity property $k needs '<start>[,<step>]' with a " +
              s"non-zero integer step, got '$v'")
        (IdentityKeyPrefix + k.substring(IdentityKeyPrefix.length)) -> v
      } else if (lk.startsWith(GeneratedKeyPrefix)) {
        // EXPRESSION COLUMN DEFAULTS (round 19): the declared expression
        // computes the column at writer-authored faces when the writer
        // omits it or leaves it null. Expression parseability is
        // checked where a session exists (setTableProperties / first
        // write) — here only the shape.
        if (k.length == GeneratedKeyPrefix.length || v.trim.isEmpty)
          throw new SnapshotPropertyException(
            s"generated-default property $k needs a column name and an " +
              "expression")
        (GeneratedKeyPrefix + k.substring(GeneratedKeyPrefix.length)) -> v
      } else throw new SnapshotPropertyException(
        s"unknown graft table property $k — the engine's knobs are " +
          s"$BloomColumnsKey, $CheckpointIntervalKey, $TargetFileSizeKey, " +
          s"$CdfKeysKey, $ConstraintKeyPrefix<name>, " +
          s"$GeneratedKeyPrefix<col>, and $IdentityKeyPrefix<col>")
    }

  /** '<start>[,<step>]' with a non-zero step — None on any other shape */
  private def parseIdentitySpec(v: String): Option[(Long, Long)] = {
    val parts = v.split(',').map(_.trim)
    try parts match {
      case Array(s) => Some((s.toLong, 1L))
      case Array(s, st) if st.toLong != 0L => Some((s.toLong, st.toLong))
      case _ => None
    } catch { case _: NumberFormatException => None }
  }

  /** the table's declared IDENTITY columns, (column, (start, step)) */
  private[storage] def identityOf(props: Map[String, String])
      : Seq[(String, (Long, Long))] =
    props.toSeq.collect { case (k, v) if k.startsWith(IdentityKeyPrefix) &&
        !k.startsWith(IdentityHighWaterPrefix) =>
      k.substring(IdentityKeyPrefix.length) -> parseIdentitySpec(v).getOrElse(
        refuse(s"unparseable identity spec under $k: '$v'"))
    }.sortBy(_._1)

  /** [[validatedProperties]] for the SQL commands' catalog lockstep —
    * the catalog must record the SAME canonical `graft.*` spellings the
    * manifest does, or SHOW-through-catalog and the manifest diverge */
  private[storage] def canonicalProperties(props: Map[String, String])
      : Map[String, String] = validatedProperties(props)

  /** the table's effective checkpoint cadence: the
    * `graft.checkpointInterval` property when set (validated at the
    * set), else [[CheckpointInterval]] */
  private def checkpointIntervalOfProps(props: Map[String, String]): Long =
    props.get(CheckpointIntervalKey)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ >= 1L).getOrElse(CheckpointInterval)

  private def checkpointIntervalOf(m: Manifest): Long =
    m.properties.get(CheckpointIntervalKey)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ >= 1L).getOrElse(CheckpointInterval)

  private val DefaultTargetFileBytes = 128L * 1024 * 1024

  /** The table's effective OPTIMIZE target file size (round 19 — the
    * Delta `targetFileSize` discipline as a `graft.*` property): an
    * explicit API argument wins, else the `graft.targetFileSize`
    * property (validated at the set), else 128 MB. SQL OPTIMIZE passes
    * no explicit size, so a property change redirects every later
    * maintenance rewrite with zero code. */
  private def targetFileBytesOf(m: Manifest, explicit: Long): Long =
    if (explicit > 0L) explicit
    else m.properties.get(TargetFileSizeKey)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ >= 1L).getOrElse(DefaultTargetFileBytes)

  /** the property-else-default target for SQL-face sizing ([[graft.storage.GraftOptimizeCommand]]) */
  private[storage] def effectiveTargetFileBytes(m: Manifest): Long =
    targetFileBytesOf(m, -1L)

  /** the table's CHECK constraints, (name, expression text) */
  private[storage] def constraintsOf(props: Map[String, String])
      : Seq[(String, String)] =
    props.toSeq.collect { case (k, v) if k.startsWith(ConstraintKeyPrefix) =>
      k.substring(ConstraintKeyPrefix.length) -> v
    }.sortBy(_._1)

  /** the table's EXPRESSION COLUMN DEFAULTS (round 19 — the
    * `graft.generated.<col>` declarations), (column, expression text) */
  private[storage] def generatedOf(props: Map[String, String])
      : Seq[(String, String)] =
    props.toSeq.collect { case (k, v) if k.startsWith(GeneratedKeyPrefix) =>
      k.substring(GeneratedKeyPrefix.length) -> v
    }.sortBy(_._1)

  /** Apply the declared EXPRESSION DEFAULTS to a WRITER-AUTHORED frame
    * (round 19 — the date-partition pattern: writers omit `day`, the
    * engine computes `CAST(ts AS DATE)` per row): an ABSENT declared
    * column is computed outright; a PRESENT one fills only its NULLs
    * (SQL DEFAULT semantics — an explicit non-null value always wins,
    * and the SQL INSERT column-list face null-fills unnamed columns, so
    * "omitted in the column list" and "absent from the frame" behave
    * identically). Applied ONLY where the rows are writer-authored —
    * full-snapshot commit, append, merge DELTA side, SQL INSERT, the
    * streaming sink — never to carried/rewritten rows (compaction and
    * CoW rewrites must stay content-neutral; backfilling an old row's
    * null there would change history). Delta-strict GENERATED ALWAYS
    * equality is OPT-IN by composing a CHECK constraint over the same
    * expression — the existing machinery refuses violating writes
    * wholesale. */
  /** GENERATED ALWAYS AS IDENTITY allocation (round 20 — the Delta
    * `delta.identity` shape on the generated-defaults machinery): for
    * each declared identity column the writer-authored frame must OMIT
    * (or carry as all-null — the SQL INSERT column-list face null-fills
    * unnamed columns), allocate the DENSE value range
    * `[highWater, highWater + n·step)` in the frame's row order and
    * advance the high-water property IN THE SAME COMMIT — monotonic,
    * never reused across commits (a lost commit race re-runs the stage
    * against the rival's committed high water, so two interleaved
    * appends allocate disjoint ranges by construction). A frame
    * carrying any NON-NULL value for the column refuses — GENERATED
    * ALWAYS semantics: the engine is the only authority, which is what
    * makes the allocation replayable as `row_number() + offset`.
    *
    * Distributed shape: one `zipWithIndex` over the frame (a
    * per-partition count job + the write pass — O(new data), the
    * stats-collection cost class; no global sort, no single-partition
    * window). RESTORE carries the header wholesale, high water
    * included — rolling back past an allocation re-issues the undone
    * range (documented, the snapshot-restore contract).
    *
    * Returns the frame with values assigned plus the property updates
    * the commit must fold in. */
  private def applyIdentity(spark: SparkSession, df: DataFrame,
                            props: Map[String, String])
      : (DataFrame, Map[String, String]) = {
    val ids = identityOf(props)
    if (ids.isEmpty) return (df, Map.empty)
    // Materialize the source ONCE before the multi-evaluation below
    // (null probe, count() for the high-water advance, zipWithIndex for
    // the write): a non-deterministic frame (rand(), sample, re-executed
    // shuffle) re-evaluated per action could allocate values that
    // disagree with the recorded high water — the same hazard
    // updateConditionDv/merge persist against (the r15 discipline).
    // The pin lives until the caller's writeData consumed the rows; the
    // commit faces unpersist via [[releaseIdentityPin]] right after.
    val cs = caseSensitive(spark)
    var out =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
        val pinned =
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        identityPinTl.set(Some(pinned))
        pinned
      } else df
    val updates = Map.newBuilder[String, String]
    ids.foreach { case (c, (start, step)) =>
      val existing = out.schema.fields.zipWithIndex.find { case (f, _) =>
        if (cs) f.name == c else f.name.equalsIgnoreCase(c) }
      existing.foreach { case (f, _) =>
        val nonNull = out.filter(col(s"`${f.name}`").isNotNull).limit(1)
          .count() // bounded probe: present-but-all-null = omitted
        require(nonNull == 0L,
          s"column ${f.name} is GENERATED ALWAYS AS IDENTITY — writers " +
            "must omit it (or leave it null through an INSERT column " +
            "list); the engine allocates its values")
      }
      val base = existing.map { case (f, _) => out.drop(f.name) }
        .getOrElse(out)
      val hw = props.get(IdentityHighWaterPrefix + c)
        .map(_.trim.toLong).getOrElse(start)
      // Dense allocation WITHOUT the rdd.zipWithIndex round-trip (round
      // 21): zipWithIndex deserializes every InternalRow to an external
      // Row and createDataFrame re-encodes it — two whole-row
      // conversions outside codegen — and runs its own per-partition
      // count job on top of the count() above (3 passes total). The
      // same global position is pid-order offset + within-partition
      // record number: monotonically_increasing_id()'s lower 33 bits
      // are exactly that record number (consecutive from 0 per
      // partition), the per-partition offsets come from ONE tiny
      // aggregate (a row per partition — bounded driver state), and
      // the ids attach through a broadcast join in a codegen
      // projection. 2 passes over the pinned blocks, no row
      // conversion, allocation order identical (partition-major).
      // The 33-bit record number caps a single partition at 2^33 rows
      // — far beyond any sane partition (zipWithIndex had no cap;
      // a >8.5e9-row partition would already be a broken layout).
      val schema0 = base.schema
      val pidC = "__graft_identity_pid"
      val midC = "__graft_identity_mid"
      val offC = "__graft_identity_off"
      val tagged = base.select(
        schema0.fieldNames.map(x => col(s"`$x`")).toSeq :+
          spark_partition_id().as(pidC) :+
          monotonically_increasing_id().as(midC): _*)
      val partCounts = tagged.groupBy(col(pidC))
        .agg(count(lit(1)).as("c"))
        .collect() // bounded: one row per input partition
        .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      val offsets = partCounts.map { case (p, cnt) =>
        val o = (p, acc); acc += cnt; o }
      val n = acc
      val offDf = {
        val sqlc = spark
        import sqlc.implicits._
        broadcast(offsets.toSeq.toDF(pidC, offC))
      }
      val appended = tagged.join(offDf, Seq(pidC))
        .withColumn(c, lit(hw) +
          (col(offC) + col(midC).bitwiseAND(lit((1L << 33) - 1))) *
            lit(step))
        .drop(pidC, midC, offC)
      // a present-but-null column keeps its original position (the SQL
      // INSERT round-trip shape); an absent one appends
      out = existing match {
        case Some((_, i)) =>
          val names = schema0.fieldNames.toSeq
          val reordered = (names.take(i) :+ c) ++ names.drop(i)
          appended.select(reordered.map(x => col(s"`$x`")): _*)
        case None => appended
      }
      updates += (IdentityHighWaterPrefix + c) -> (hw + n * step).toString
    }
    (out, updates.result())
  }

  /** the frame [[applyIdentity]] pinned for this thread's in-flight
    * commit attempt; released by the commit faces AFTER writeData
    * consumed the rows (unpersisting earlier would let the write
    * recompute a non-deterministic source) */
  private val identityPinTl =
    ThreadLocal.withInitial[Option[DataFrame]](() => None)
  private def releaseIdentityPin(): Unit = {
    identityPinTl.get().foreach(_.unpersist(false))
    identityPinTl.set(None)
  }

  /** Delta's `ALTER TABLE ... SYNC IDENTITY`: recompute each declared
    * identity column's high-water mark from the LIVE DATA — after a
    * RESTORE re-issued an undone range (the documented restore
    * contract) or an external backfill, the next allocation must clear
    * every live value. One column-pruned aggregate over the table (max
    * for a positive step, min for a negative one), committed through
    * the same metadata-only property commit SET TBLPROPERTIES uses —
    * atomic, race-retried, history-preserving. */
  def syncIdentity(spark: SparkSession, dir: String,
                   reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val cur = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    val h = headerInfoOf(spark, dir, cur)
    val ids = identityOf(h.properties)
    require(ids.nonEmpty,
      s"no identity columns are declared at $dir — declare one with " +
        s"TBLPROPERTIES ('$IdentityKeyPrefix<col>' = '<start>[,<step>]')")
    val df = read(spark, dir)
    val aggs = ids.map { case (c, (_, step)) =>
      (if (step > 0) max(col(s"`$c`")) else min(col(s"`$c`"))).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val updates = ids.zipWithIndex.map { case ((c, (start, step)), i) =>
      val next = if (row.isNullAt(i)) start else row.getLong(i) + step
      (IdentityHighWaterPrefix + c) -> next.toString
    }.toMap
    setTableProperties(spark, dir, updates, reclaimGraceMs)
  }

  /** refuse row-replacing upserts on identity tables: a merge delta
    * cannot carry the identity column (GENERATED ALWAYS), so replaced
    * rows would silently lose their allocated values */
  private def refuseIdentityUpsert(props: Map[String, String],
                                   what: String): Unit = {
    val ids = identityOf(props)
    require(ids.isEmpty,
      s"$what is not supported on a table with GENERATED ALWAYS AS " +
        s"IDENTITY column(s) ${ids.map(_._1).mkString(", ")} — replaced " +
        "rows would lose their allocated values; append new rows and " +
        "mutate through UPDATE/DELETE instead")
  }

  private def applyColumnDefaults(spark: SparkSession, df: DataFrame,
                                  defaults: Seq[(String, String)]): DataFrame =
    if (defaults.isEmpty) df
    else {
      val cs = caseSensitive(spark)
      defaults.foldLeft(df) { case (d, (c, ex)) =>
        d.schema.fields.find(f =>
          if (cs) f.name == c else f.name.equalsIgnoreCase(c)) match {
          case Some(f) =>
            // fill only nulls, at the column's own committed type and
            // under its existing spelling
            d.withColumn(f.name, coalesce(col(s"`${f.name}`"),
              expr(ex).cast(f.dataType)))
          case None => d.withColumn(c, expr(ex))
        }
      }
    }

  /** Names of CHECK constraints whose expression references `colName`
    * — RENAME and DROP of a constrained column must refuse: the
    * recorded expression text would stop resolving at the write-time
    * gate and wedge EVERY later commit behind an unresolved-column
    * error (Delta refuses these DDLs for exactly this reason). An
    * unparseable expression conservatively counts as referencing. */
  private def constraintsReferencing(spark: SparkSession,
                                     props: Map[String, String],
                                     colName: String): Seq[String] = {
    val resolver = spark.sessionState.conf.resolver
    def references(ex: String): Boolean =
      try spark.sessionState.sqlParser.parseExpression(ex).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.head
      }.exists(resolver(_, colName))
      catch { case scala.util.control.NonFatal(_) => true }
    constraintsOf(props).collect { case (n, ex) if references(ex) => n } ++
      // expression defaults reference columns the same way — renaming
      // or dropping one from under a default would wedge every later
      // writer-authored commit behind an unresolved-column error
      generatedOf(props).collect { case (c, ex)
        if references(ex) || resolver(c, colName) =>
        s"expression-default:$c" } ++
      // an IDENTITY declaration names its column the same way
      identityOf(props).collect { case (c, _) if resolver(c, colName) =>
        s"identity:$c" }
  }

  /** ONE aggregated pass validates every CHECK constraint over the
    * freshly written rows (SQL CHECK semantics: a row passes unless the
    * expression is FALSE — null passes). The first violated constraint
    * refuses with its name, expression, and violation count. */
  private def validateConstraints(props: Map[String, String], df: DataFrame,
                                  operation: String): Unit = {
    val checks = constraintsOf(props)
    if (checks.isEmpty) return
    val aggs = checks.map { case (n, ex) =>
      count(when(!coalesce(expr(ex), lit(true)), 1)).as(s"__chk_$n")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    checks.zipWithIndex.foreach { case ((n, ex), i) =>
      val bad = row.getLong(i)
      if (bad > 0L) throw new ConstraintViolationException(
        s"commit ($operation) violates CHECK constraint $n ($ex) on " +
          s"$bad row(s) — nothing was committed")
    }
  }

  /** `ALTER TABLE ... SET TBLPROPERTIES` (round 18): a METADATA-ONLY
    * commit (operation `set-tblproperties`) merging `updates` into the
    * carried property map — every file carries, zero data bytes move.
    * The engine's own knobs take effect at once: `graft.bloomColumns`
    * re-declares the bloom columns (new files' blooms collect on them;
    * carried files' existing blooms stay), `graft.checkpointInterval`
    * re-paces the periodic checkpoint, and `graft.constraints.<name>`
    * adds a CHECK every later write validates — ADDING a constraint
    * validates the CURRENT table first (Delta's ADD CONSTRAINT
    * contract: a table already in violation refuses the constraint). */
  def setTableProperties(spark: SparkSession, dir: String,
                         updates: Map[String, String],
                         reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(updates.nonEmpty, "SET TBLPROPERTIES needs at least one pair")
    // CANONICALIZE FIRST: every downstream dispatch (the bloom
    // re-declaration, new-constraint detection, the recorded map) must
    // see the canonical `graft.*` spelling — a case-variant key
    // (`graft.BloomColumns`) validated fine but missed the exact-case
    // lookups below, landing in the manifest as a knob that never took
    // operational effect (the silent no-op this surface exists to
    // refuse).
    val canon = validatedProperties(updates)
    if (latestVersion(spark, dir).isEmpty)
      refuse(s"no committed version at $dir")
    // a newly declared EXPRESSION DEFAULT must parse NOW — a typo'd
    // expression refusing only at the next write would wedge a later,
    // unrelated commit behind this statement's mistake
    canon.foreach { case (k, v) =>
      if (k.startsWith(GeneratedKeyPrefix))
        try spark.sessionState.sqlParser.parseExpression(v)
        catch { case scala.util.control.NonFatal(_) =>
          throw new SnapshotPropertyException(
            s"generated-default property $k holds an unparseable " +
              s"expression: '$v'")
        }
    }
    // re-declared bloom columns flow into the operational field too
    val bloomsOpt = canon.get(BloomColumnsKey)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    commitStagedFull(spark, dir, "set-tblproperties", reclaimGraceMs,
      bloomColsOpt = bloomsOpt,
      propertiesFn = Some(p =>
        p.map(_.properties).getOrElse(Map.empty) ++ canon)) { (prior, _) =>
      val m = prior.getOrElse(refuse(s"no committed version at $dir"))
      // a NEW or CHANGED CHECK constraint must hold on the existing
      // rows (Delta's ADD CONSTRAINT contract) — validated against the
      // IN-LOOP prior, so a lost-race retry re-validates over a rival's
      // concurrently committed rows (the addColumns/dropColumns
      // discipline); DV-masked rows don't count (readFiles applies them)
      val newChecks = constraintsOf(canon)
        .filter { case (n, ex) =>
          !m.properties.get(ConstraintKeyPrefix + n).contains(ex) }
      if (newChecks.nonEmpty)
        validateConstraints(
          newChecks.map { case (n, ex) =>
            (ConstraintKeyPrefix + n) -> ex }.toMap,
          readFiles(spark, dir, m, m.files), "add-constraint")
      Staged(m.files, m.stats) // pure metadata — everything carries
    }
  }

  /** `ALTER TABLE ... UNSET TBLPROPERTIES` — removes keys (including
    * `graft.constraints.<name>`, which is how a constraint DROPs);
    * unknown keys are ignored (the SQL `IF EXISTS` temper — matching
    * Spark's own lenient UNSET). Unsetting `graft.bloomColumns` stops
    * declaring blooms for FUTURE files. `graft.*` keys match
    * case-insensitively (they are stored canonically and validated
    * case-insensitively at SET); NON-graft keys match EXACTLY — they
    * are opaque case-sensitive user metadata, and unsetting `owner`
    * must never also destroy a distinct `Owner`. */
  def unsetTableProperties(spark: SparkSession, dir: String,
                           keys: Seq[String],
                           reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(keys.nonEmpty, "UNSET TBLPROPERTIES needs at least one key")
    require(latestVersion(spark, dir).isDefined,
      s"no committed version at $dir")
    val bloomsOpt =
      if (keys.exists(_.equalsIgnoreCase(BloomColumnsKey)))
        Some(Seq.empty[String])
      else None
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val graftKeys = keys.filter(k => lower(k).startsWith("graft."))
      .map(lower).toSet
    val exactKeys = keys.filterNot(k => lower(k).startsWith("graft.")).toSet
    commitStagedFull(spark, dir, "unset-tblproperties", reclaimGraceMs,
      bloomColsOpt = bloomsOpt,
      propertiesFn = Some(p =>
        p.map(_.properties).getOrElse(Map.empty).filterNot { case (k, _) =>
          exactKeys(k) ||
            (lower(k).startsWith("graft.") && graftKeys(lower(k))) })) {
      (prior, _) =>
        val m = prior.getOrElse(refuse(s"no committed version at $dir"))
        Staged(m.files, m.stats) // pure metadata — everything carries
    }
  }

  /** RESTORE (round 15 — Delta's `RESTORE TABLE ... TO VERSION AS OF`):
    * commit a NEW version whose content — files, stats, schema,
    * partition layout — IS that of the retained `toVersion`. Rollback as
    * an ordinary commit: history is preserved (the bad versions stay
    * time-travelable until vacuum), readers of intermediate versions are
    * untouched, the change feed sees a content commit (re-appeared files
    * surface), and ZERO data is copied — the manifest re-references the
    * old version's immutable files. */
  def restore(spark: SparkSession, dir: String, toVersion: Long,
              reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    val m = manifest(spark, dir, toVersion) // refuses if vacuumed
    commitStagedFull(spark, dir, "restore", reclaimGraceMs,
      partitionBy = Some(m.partitionCols),
      schemaOverride = m.schemaStruct,
      bloomColsOpt = Some(m.bloomCols),
      droppedColsFn = Some(_ => m.droppedCols),
      propertiesFn = Some(_ => m.properties)) { (_, _) =>
      Staged(m.files, m.stats, Some(m.dvs))
    }
  }

  /** CLONE (round 15 — the dev/test sandbox primitive): initialize
    * `targetDir` as a NEW table whose first version holds the content of
    * `sourceDir`'s `sourceVersion`. SHALLOW by default (`copyData =
    * false`): the clone's manifest REFERENCES the source's immutable
    * data files — zero bytes copied; the clone's own commits (appends,
    * CoW mutations, maintenance) write under ITS directory and never
    * touch the source, and the clone's vacuum only reclaims its own
    * data root, never source files. Caveat (Delta's shallow-clone
    * contract verbatim): vacuuming the SOURCE can reclaim files a
    * shallow clone still references — pass `copyData = true` (deep
    * clone) to decouple, at the cost of one data rewrite. */
  def cloneTable(spark: SparkSession, sourceDir: String, sourceVersion: Long,
                 targetDir: String, copyData: Boolean = false,
                 reclaimGraceMs: Long = DefaultReclaimGraceMs): Long = {
    require(latestVersion(spark, targetDir).isEmpty,
      s"clone target $targetDir already has committed versions")
    val m = manifest(spark, sourceDir, sourceVersion)
    if (copyData)
      commit(spark, targetDir, readAsOf(spark, sourceDir, sourceVersion),
        "clone", reclaimGraceMs, partitionBy = m.partitionCols,
        bloomCols = m.bloomCols, tblProperties = m.properties)
    else commitStagedFull(spark, targetDir, "clone", reclaimGraceMs,
      partitionBy = Some(m.partitionCols),
      schemaOverride = m.schemaStruct,
      bloomColsOpt = Some(m.bloomCols),
      droppedColsFn = Some(_ => m.droppedCols),
      propertiesFn = Some(_ => m.properties)) { (_, _) =>
      Staged(m.files, m.stats, Some(m.dvs))
    }
  }

  /** [[vacuum]] by AGE (round 16 — the Delta `RETAIN n HOURS` spelling):
    * retain every version committed AT OR AFTER `cutoffMs` (always at
    * least the latest). Commit timestamps are monotone, so the retained
    * set is a suffix — exactly the prefix-drop contract [[vacuum]] and
    * the time-travel binary search rely on. Pre-timestamp legacy
    * versions (ts = 0) count as older than any cutoff. */
  def vacuumOlderThan(spark: SparkSession, dir: String,
                      cutoffMs: Long): Unit =
    retainForCutoff(spark, dir, cutoffMs)
      .foreach(r => vacuum(spark, dir, r))

  /** the RETAIN count equivalent of an age cutoff — the monotone
    * timestamps admit a binary search (O(log n) manifest reads, not one
    * per retained version; the same class as TIMESTAMP AS OF). None on
    * an uninitialized dir. Shared by [[vacuumOlderThan]] and the DRY
    * RUN face so both resolve age identically. */
  private def retainForCutoff(spark: SparkSession, dir: String,
                              cutoffMs: Long): Option[Int] = {
    val vs = versions(spark, dir)
    if (vs.isEmpty) return None
    var lo = 0
    var hi = vs.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (commitInfo(spark, dir, vs(mid))._2 >= cutoffMs) hi = mid
      else lo = mid + 1
    }
    Some(math.max(1, vs.length - lo))
  }

  /** [[vacuumDryRun]] with age-based retention — the preview face of
    * [[vacuumOlderThan]]. */
  def vacuumOlderThanDryRun(spark: SparkSession, dir: String,
                            cutoffMs: Long): Seq[String] =
    retainForCutoff(spark, dir, cutoffMs)
      .map(r => vacuumDryRun(spark, dir, r)).getOrElse(Seq.empty)

  /** Drop versions older than the newest `retain`, then delete every
    * data file (and version directory) no RETAINED manifest references —
    * orphans from torn commits included. Manifest deletion happens
    * FIRST (and in DESCENDING version order: at any crash point the
    * surviving dropped-zone entries are a PREFIX [1..k] of the log,
    * which still bottoms out on the self-contained first commit — an
    * ascending sweep would delete reconstruction bases out from under
    * later deltas, wedging versions()-driven surfaces like DESCRIBE
    * HISTORY until a re-run), so a crash mid-vacuum can only strand
    * unreferenced files (re-collected next run) — every still-listed
    * version stays reconstructable. */
  def vacuum(spark: SparkSession, dir: String, retain: Int = 2): Unit = {
    require(retain >= 1, "must retain at least the latest version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - retain))
    // refresh the checkpoint pointer BEFORE dropping manifests: a stale
    // pointer naming a soon-vacuumed version would force every later
    // read back onto the full-listing fallback; the ingest high-water
    // mark is folded in first while the dropped manifests still exist
    keep.lastOption.foreach { latest =>
      val maxIngest = maxIngestBatchId(spark, dir).getOrElse(-1L)
      writePointer(spark, dir, Pointer(latest, maxIngest))
    }
    // reconstruct the retained states BEFORE any log entry is dropped
    val keptManifests = manifestRange(spark, dir, keep)
    // the earliest retained version becomes the log's new replay BASE:
    // its action delta (if any) references predecessors about to drop,
    // so a full-state checkpoint is pinned there FIRST — and unlike the
    // interval checkpoints this one is load-bearing, so its write is
    // strict (any failure aborts the vacuum with the log intact)
    if (drop.nonEmpty) keptManifests.headOption.foreach { base =>
      if (readCheckpoint(spark, dir, base.version).isEmpty) {
        writeCheckpoint(spark, dir, base)
        // this checkpoint is LOAD-BEARING (the new replay base), so its
        // publish is verified by READ-BACK before any manifest drops —
        // a torn publish (e.g. racing checkpointers) aborts the vacuum
        // with the log intact instead of deleting the base's deltas
        require(readCheckpoint(spark, dir, base.version).contains(base),
          s"pinned replay base v${base.version} failed read-back " +
            "verification — vacuum aborted with the log intact")
      }
    }
    drop.reverse.foreach { v =>
      onVacuumDropForTest(v) // spec seam: crash mid-loop deterministically
      f.delete(manifestPath(dir, v), false)
      f.delete(checkpointPath(dir, v), false) // derived; drops with it
      f.delete(checkpointDataPath(dir, v), true) // its parquet parts too
    }
    // stale parquet-checkpoint staging dirs (a crash between the parts
    // write and the publish rename) — age-gated like orphaned data dirs,
    // so a LIVE checkpointer's staging is never swept from under it
    val mdp = new Path(manifestDir(dir))
    if (f.exists(mdp)) f.listStatus(mdp).foreach { st =>
      if (st.getPath.getName.matches("\\.v\\d{8}\\.ckpt\\.tmp") &&
          System.currentTimeMillis() - st.getModificationTime >=
            DefaultReclaimGraceMs)
        f.delete(st.getPath, true)
    }
    reclaimableDirs(spark, dir, keptManifests)
      .foreach(p => f.delete(p, true)) // whole version dir unreferenced
  }

  /** The version directories the RETAINED manifests no longer
    * reference — the reclaim predicate shared by [[vacuum]] and
    * [[vacuumDryRun]] (one definition, no drift): a dir goes iff no
    * retained manifest references any of its data files, deletion
    * vectors, or bloom sidecars.
    *
    * Deletion-vector files referenced by retained manifests must
    * survive — a DV-only commit's version dir holds NO data files
    * (only the hidden `_dv`), so the check consults dv paths by URI
    * prefix, not the (hidden-filtered) data listing; bloom SIDECARS
    * survive the same way (normally co-located with the files they
    * describe, but a CONVERT commit's version dir holds ONLY the
    * sidecar). BOTH sides qualify through the filesystem first: legacy
    * refs recorded from a relative table dir must still match the
    * qualified listing paths. */
  private def reclaimableDirs(spark: SparkSession, dir: String,
                              keptManifests: Seq[Manifest]): Seq[Path] = {
    val f = fs(spark, dir)
    val referenced = keptManifests.flatMap(_.files).toSet
    val referencedDvPaths = keptManifests
      .flatMap(_.dvs.values.map(dv =>
        f.makeQualified(new Path(dv.path)).toUri.getPath)).toSet
    val referencedBloomDirs = keptManifests
      .flatMap(_.stats.values.flatMap(_.blooms.values.flatMap(_.sidecar)))
      .map(p => f.makeQualified(new Path(p)).toUri.getPath).toSet
    val dataRoot = new Path(s"$dir/data")
    if (!f.exists(dataRoot)) return Seq.empty
    f.listStatus(dataRoot).toSeq.filter { st =>
      val files = listParquet(spark, st.getPath.toString)
      val dirPath = f.makeQualified(st.getPath).toUri.getPath
      def holds(refs: Set[String]) = refs.exists(p =>
        p == dirPath || p.startsWith(dirPath + "/"))
      files.forall(p => !referenced.contains(p)) &&
        !holds(referencedDvPaths) && !holds(referencedBloomDirs)
    }.map(_.getPath)
  }

  /** What [[vacuum]] WOULD remove, without mutating anything (round 19
    * — Delta's `VACUUM ... DRY RUN`): the dropped versions' manifest
    * log entries (and their derived checkpoints) plus every version
    * directory the retained set no longer references. Read-only by
    * construction — the operator previews the blast radius, then runs
    * the real vacuum. The real vacuum additionally PINS a checkpoint at
    * the new replay base before dropping anything; the dry run neither
    * needs nor writes it (a derived accelerator, not a deletion). */
  def vacuumDryRun(spark: SparkSession, dir: String,
                   retain: Int = 2): Seq[String] = {
    require(retain >= 1, "must retain at least the latest version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - retain))
    val keptManifests = manifestRange(spark, dir, keep)
    val logEntries = drop.flatMap { v =>
      Seq(manifestPath(dir, v)) ++
        Seq(checkpointPath(dir, v)).filter(f.exists) ++
        Seq(checkpointDataPath(dir, v)).filter(f.exists)
    }
    // age-expired checkpoint STAGING dirs (round 20): the real vacuum
    // sweeps these too — the preview must report the same blast radius
    val mdp = new Path(manifestDir(dir))
    val staleStaging =
      if (!f.exists(mdp)) Seq.empty
      else f.listStatus(mdp).toSeq.filter(st =>
        st.getPath.getName.matches("\\.v\\d{8}\\.ckpt\\.tmp") &&
          System.currentTimeMillis() - st.getModificationTime >=
            DefaultReclaimGraceMs).map(_.getPath)
    (logEntries ++ staleStaging ++ reclaimableDirs(spark, dir, keptManifests))
      .map(_.toString)
  }

  /** IN-PLACE conversion of an existing plain-parquet directory into a
    * snapshot table (round 16 — Delta's `CONVERT TO DELTA` shape): the
    * first manifest REFERENCES the directory's existing files where they
    * lie — ZERO bytes rewritten on a 100 TB migration — with stats (and
    * declared blooms) collected in the usual single column-pruned pass,
    * so the converted table immediately time-travels, file-skips, and
    * streams. A hive-partitioned source passes `partitionBy` (values
    * come from the `col=value` path segments exactly as native commits;
    * types from the directory read's inference — re-commit full-snapshot
    * to pin them if inference ever flips). Later commits write under
    * `<dir>/data` as usual; CoW mutations rewrite referenced files into
    * version dirs and drop the references naturally. Caveat (documented,
    * matching the in-place contract): the ORIGINAL files live at the
    * directory root, outside the `data/` tree [[vacuum]] manages — after
    * a full rewrite (compaction) they become unreferenced but are left
    * for the caller to reclaim. */
  def convertParquet(spark: SparkSession, dir: String,
                     partitionBy: Seq[String] = Seq.empty,
                     bloomCols: Seq[String] = Seq.empty): Long = {
    require(latestVersion(spark, dir).isEmpty,
      s"convert target $dir already has committed versions")
    val sized = listParquetSized(spark, dir)
    require(sized.nonEmpty, s"no parquet files under $dir to convert")
    val files = sized.map(_._1)
    if (partitionBy.nonEmpty) files.foreach(partitionRawValues(_, partitionBy))
    // EVERY hive `k=v` level of the source must be declared: a partial
    // declaration would commit the undeclared level as a DATA column no
    // file physically holds — every read would null-fill it silently
    val rootPath = fs(spark, dir).makeQualified(new Path(dir)).toUri.getPath
    val discovered = files.flatMap { f =>
      new Path(f).toUri.getPath.stripPrefix(rootPath).split('/')
        .filter(_.indexOf('=') > 0).map(_.takeWhile(_ != '='))
    }.distinct
    val undeclared = discovered.filterNot(k =>
      partitionBy.exists(_.equalsIgnoreCase(k)))
    require(undeclared.isEmpty,
      s"source layout has hive partition levels (${discovered.mkString(", ")}) " +
        s"but partitionBy declares only (${partitionBy.mkString(", ")}) — " +
        "declare every level")
    // unpartitioned: schema from the FILES (a stray hive-looking segment
    // must not inject a discovered column the files don't hold);
    // partitioned: the directory read derives the hive layout. Merge ALL
    // footers — a schema-evolved source dir's newest columns must not
    // depend on which single footer inference samples (the CONVERT TO
    // DELTA read-all-footers discipline).
    val reader =
      if (partitionBy.isEmpty)
        spark.read.option("mergeSchema", "true").parquet(files: _*)
      else spark.read.option("mergeSchema", "true").parquet(dir)
    val schema = asNullableSchema(reader.schema)
    partitionBy.foreach(c => require(
      schema.fields.exists(_.name.equalsIgnoreCase(c)),
      s"partition column $c not found in the source layout"))
    commitStagedFull(spark, dir, "convert",
      partitionBy = Some(partitionBy),
      schemaOverride = Some(schema),
      bloomColsOpt = Some(bloomCols)) { (_, dataDir) =>
      // stats collect INSIDE the stage so declared blooms land in the
      // convert commit's own sidecar dir (the converted files live at
      // the source root, outside any version dir — their bloom bits
      // must not)
      Staged(files,
        collectStats(reader, files, sized.toMap, bloomCols,
          Some(bloomSidecarDirOf(dataDir))),
        Some(Map.empty))
    }
  }

  /** Row-grain change-data feed between two committed versions: one row
    * per INSERTED or DELETED key, TWO rows per updated key
    * (`update_preimage` = the row as of `fromVersion`,
    * `update_postimage` = as of `toVersion`), tagged in `_change_type`
    * — the Delta CDF vocabulary, derived from the two snapshots rather
    * than a persisted change log (correct across ANY operation mix:
    * merges, deletes, full-snapshot replaces, compactions). Unchanged
    * rows never surface. An update is ANY non-key column differing
    * (null-safe struct compare); columns added by schema evolution
    * between the versions read as null on the pre side, so a row whose
    * only change is the new column's arrival reports as an update.
    *
    * Scale shape: ONE full-outer join on the key (bucketable /
    * co-partitionable — the same plan class as the snapshot diff),
    * change classification is a codegen'd struct compare, and updates
    * fan out through an explode, never a second join. Keys must be
    * unique per version (the [[merge]] invariant). */
  def readRowChanges(spark: SparkSession, dir: String,
                     fromVersion: Long, toVersion: Long,
                     idCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "the change feed needs key columns")
    require(fromVersion < toVersion,
      s"fromVersion $fromVersion must precede toVersion $toVersion")
    // ADJACENT versions decompose into the commit's OWN action delta
    // (round 20): changes derive from the commit's added/removed files
    // and deletion-vector delta alone — O(changed), never a join of
    // the two complete table snapshots. Non-adjacent ranges keep the
    // boundary join: the feed's documented grain is the NET change
    // across the range, which per-commit unions cannot express.
    if (toVersion == fromVersion + 1) {
      readCommitChanges(spark, dir, toVersion, idCols) match {
        case Some(df) => return df
        case None => () // legacy self-contained entry: boundary join
      }
    }
    readRowChangesBoundary(spark, dir, fromVersion, toVersion, idCols)
  }

  /** the boundary-join form of [[readRowChanges]] — O(table): the NET
    * diff of the two complete version snapshots. Non-adjacent ranges
    * land here semantically (NET is the documented grain); adjacent
    * pairs only as the legacy-log fallback. Package-visible so the
    * per-commit path's equivalence is spec-asserted against it. */
  private[graft] def readRowChangesBoundary(spark: SparkSession,
                                              dir: String,
                                              fromVersion: Long,
                                              toVersion: Long,
                                              idCols: Seq[String]): DataFrame = {
    // both manifests read ONCE — the snapshot scans and the rename
    // alignment below share them (an action-log reconstruction is a
    // checkpoint + delta fold; no reason to pay it twice per side)
    val mTo = manifest(spark, dir, toVersion)
    val mFrom = manifest(spark, dir, fromVersion)
    require(mTo.files.nonEmpty, s"version $toVersion holds no data files")
    require(mFrom.files.nonEmpty, s"version $fromVersion holds no data files")
    setLastRowChangesScan(RowChangesScan("boundary",
      (mFrom.files ++ mTo.files).distinct))
    val post = readFiles(spark, dir, mTo, mTo.files)
    val cols = post.columns.toSeq
    validateCdfColumns(cols, idCols, toVersion)
    val pre = {
      val p1 = readFiles(spark, dir, mFrom, mFrom.files)
      // RENAME-transparent (round 17, column mapping): a renamed column
      // is the SAME column — align the pre side's logical names to the
      // post side's through their shared PHYSICAL identity, so the feed
      // never reports a rename as a whole-table update storm. ONE select
      // does the whole alignment: rename CHAINS that reuse a freed name
      // resolve simultaneously (a sequential rename/drop fold would act
      // on both same-named columns mid-flight), and a column DROPPED
      // between the versions is simply omitted — a same-named re-add is
      // a DIFFERENT column (fresh physical), so it correctly null-fills
      // below (a genuine pre-image of null), never the dead bytes.
      val toPhys: Map[String, String] = mTo.schemaStruct.map(s =>
        s.fields.iterator.map(f => physicalName(f) -> f.name).toMap)
        .getOrElse(Map.empty)
      val p0 = mFrom.schemaStruct match {
        case Some(ps) if toPhys.nonEmpty =>
          val aligned = ps.fields.toSeq.flatMap(f =>
            toPhys.get(physicalName(f)).map(postName =>
              p1(f.name).as(postName)))
          // ZERO shared physical identity = a wholesale schema replace:
          // keep the pre side as-is (rows surface as deletes + inserts,
          // the pre-mapping behavior) rather than a zero-column frame
          if (aligned.isEmpty) p1 else p1.select(aligned: _*)
        case _ => p1
      }
      cols.foldLeft(p0) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(post.schema(c).dataType))
      }
    }
    classifyRowChanges(pre, post, idCols, cols)
  }

  /** refuse a change-feed read whose output would be ambiguous: a
    * reserved-name collision or a key column the version doesn't hold */
  private def validateCdfColumns(cols: Seq[String], idCols: Seq[String],
                                 toVersion: Long): Unit = {
    val reserved = Set("__pre", "__post", "__types", "_change_type")
    cols.filter(reserved).foreach(c => sys.error(
      s"column $c collides with the change feed's output — rename it"))
    idCols.foreach(c => require(cols.contains(c),
      s"key column $c is not in version $toVersion's schema"))
  }

  /** The shared CDF classifier: full-outer join `pre` against `post` on
    * the (null-safe) key, tag insert / delete / update pre+post pairs in
    * `_change_type`, drop unchanged rows. Both frames must already
    * spell the SAME columns (`cols` — the post side's). One shuffle on
    * the key (bucketable / co-partitionable — the snapshot-diff plan
    * class); classification is a codegen'd struct compare; updates fan
    * out through an explode, never a second join. */
  private def classifyRowChanges(pre: DataFrame, post: DataFrame,
                                 idCols: Seq[String],
                                 cols: Seq[String]): DataFrame = {
    val dataCols = cols.filterNot(idCols.contains)
    require(dataCols.nonEmpty,
      "the key covers every column — nothing to diff at row grain")
    // frame-qualified refs + getField resolve EXACT column names
    // (a name containing '.' must not parse as a nested path)
    val p = pre.select(idCols.map(pre(_)) :+
      struct(dataCols.map(pre(_)): _*).as("__pre"): _*)
    val q = post.select(idCols.map(post(_)) :+
      struct(dataCols.map(post(_)): _*).as("__post"): _*)
    // null-SAFE key equality: a null-keyed row present unchanged on both
    // sides must match itself, not surface as a spurious delete+insert
    // (keys are unique per version — the merge invariant — so the null
    // key group is at most 1:1)
    val joined = p.join(q, idCols.map(c => p(c) <=> q(c)).reduce(_ && _),
      "full_outer")
    val tagged = joined
      .select(idCols.map(c => coalesce(p(c), q(c)).as(c)) :+
        col("__pre") :+ col("__post"): _*)
      .withColumn("__types",
        when(col("__pre").isNull, array(lit("insert")))
          .when(col("__post").isNull, array(lit("delete")))
          .when(!(col("__pre") <=> col("__post")),
            array(lit("update_preimage"), lit("update_postimage")))
          .otherwise(array().cast("array<string>")))
      .withColumn("_change_type", explode(col("__types")))
    val fromPre = col("_change_type").isin("delete", "update_preimage")
    tagged.select(idCols.map(c => tagged(c)) ++ dataCols.map(c =>
      when(fromPre, col("__pre").getField(c))
        .otherwise(col("__post").getField(c)).as(c)) :+
      col("_change_type"): _*)
  }

  /** what the most recent [[readRowChanges]] call on THIS thread
    * scanned: the path taken (`per-commit` | `boundary` | `rewrite` |
    * `metadata`) and the DATA files its plan reads — the O(changed)
    * contract's fence (a one-commit feed must list only that commit's
    * added/removed/DV-touched files, never the table's). */
  final case class RowChangesScan(mode: String, dataFiles: Seq[String])
  private val lastRowChangesScanTl =
    ThreadLocal.withInitial[RowChangesScan](() => RowChangesScan("", Seq.empty))
  def lastRowChangesScan: RowChangesScan = lastRowChangesScanTl.get()
  private def setLastRowChangesScan(v: RowChangesScan): Unit =
    lastRowChangesScanTl.set(v)

  /** Per-commit (O(changed)) row-grain change feed of ONE commit
    * (round 20 — the Delta commit-scoped CDF shape): derive the changes
    * of version `v` against `v - 1` from the commit's OWN action
    * delta — scanning only its added files, its removed files, and the
    * deletion-vector entries it changed — never the two complete table
    * snapshots. The pre side is the removed files' rows (as of `v-1`,
    * their old vectors applied) plus the carried files' NEWLY-masked
    * rows; the post side is the added files' rows (the new vectors
    * applied) plus any rows a vector shrink resurrected (restore). The
    * shared classifier then yields exactly the boundary join's answer
    * for the adjacent pair: unchanged carried rows appear on neither
    * side, and a CoW rewrite's untouched rows appear on BOTH sides and
    * cancel in the struct compare.
    *
    * Both sides read with version `v`'s schema: the data files are
    * immutable bytes, physical names are stable under column mapping
    * (rename-transparent for free), a column added at `v` null-fills
    * the pre side, and a drop+re-add reads the fresh physical — the
    * same projection the boundary path's alignment computes.
    *
    * Returns None only for a legacy SELF-CONTAINED log entry (no action
    * delta to decompose — the caller boundary-joins); a rewrite commit
    * (content-neutral by [[RewriteOps]]) and a metadata-only commit
    * yield an EMPTY typed frame. */
  private def readCommitChanges(spark: SparkSession, dir: String,
                                v: Long,
                                idCols: Seq[String]): Option[DataFrame] = {
    val d = readRaw(spark, dir, v) match {
      case Right(delta) => delta
      case Left(_) => return None
    }
    val mTo = manifest(spark, dir, v)
    val mFrom = manifest(spark, dir, v - 1)
    require(mTo.files.nonEmpty, s"version $v holds no data files")
    require(mFrom.files.nonEmpty, s"version ${v - 1} holds no data files")
    val schema = mTo.schemaStruct.getOrElse(return None)
    val cols = schema.fields.map(_.name).toSeq
    validateCdfColumns(cols, idCols, v)
    val dataCols = cols.filterNot(idCols.contains)
    require(dataCols.nonEmpty,
      "the key covers every column — nothing to diff at row grain")
    def emptyCdf(mode: String): Option[DataFrame] = {
      setLastRowChangesScan(RowChangesScan(mode, Seq.empty))
      val out = StructType(
        idCols.map(c => schema(schema.fieldIndex(c))) ++
          dataCols.map(c => schema(schema.fieldIndex(c))) :+
          StructField("_change_type", StringType, nullable = false))
      Some(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], out))
    }
    if (RewriteOps(d.operation)) return emptyCdf("rewrite")
    val priorSet = mFrom.files.toSet
    val addKeys = d.adds.map(_._1).toSet
    // a file both removed and re-added in one delta is CARRIED for CDF
    // purposes (defensive — deltaOf never emits the shape): its rows
    // exist on both sides, so only its vector delta can change anything
    val added = d.adds.map(_._1).filterNot(priorSet)
    val removed = d.removes.filter(f => priorSet(f) && !addKeys(f))
    val removedSet = removed.toSet
    // carried files whose DELETION VECTOR changed this commit: compare
    // refs (a fold writes a new per-version bucket path; a restore may
    // drop or shrink one)
    val dvChanged = mTo.files.filter(f => priorSet(f) && !addKeys(f) &&
      mFrom.dvs.get(f) != mTo.dvs.get(f))
    if (added.isEmpty && removed.isEmpty && dvChanged.isEmpty)
      return emptyCdf("metadata")
    setLastRowChangesScan(RowChangesScan("per-commit",
      (removed ++ added ++ dvChanged).distinct))
    // ---- deletion-vector DELTA: entries present on exactly one side.
    // DV bucket files hold entries of OTHER files too (bucketing) —
    // restrict by spelling first (bounded collect: one row per marked
    // file, the writeFoldedVector discipline)
    val dvKeys = dvChanged.map(pathKey).toSet
    def dvEntriesOf(paths: Seq[String]): DataFrame = {
      val none = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], DvSchema)
      if (paths.isEmpty) none
      else {
        val e = spark.read.schema(DvSchema).parquet(paths.distinct: _*)
        val spellings = e.select(col("file")).distinct()
          .collect() // bounded: one row per marked file
          .map(_.getString(0)).filter(s => dvKeys(pathKey(s)))
        if (spellings.isEmpty) none
        else e.filter(col("file").isin(spellings.toSeq: _*))
      }
    }
    val oldE = dvEntriesOf(dvChanged.flatMap(mFrom.dvs.get).map(_.path))
    val newE = dvEntriesOf(dvChanged.flatMap(mTo.dvs.get).map(_.path))
    val newlyMasked = newE.join(oldE, Seq("file", "pos"), "left_anti")
    val unmasked = oldE.join(newE, Seq("file", "pos"), "left_anti")
    // rows of the DV-changed files at exactly the marked positions —
    // one scan of those files per side that needs it, semi-joined
    // against the (broadcast, DV-sized) position delta
    def rowsAtMarks(marks: DataFrame): DataFrame =
      rawReadFiles(spark, dir, mTo.copy(dvs = Map.empty), dvChanged)
        .withColumn("__dv_file", col("_metadata.file_path"))
        .withColumn("__dv_pos", col("_metadata.row_index"))
        .join(broadcast(marks
          .withColumnRenamed("file", "__dv_file")
          .withColumnRenamed("pos", "__dv_pos")),
          Seq("__dv_file", "__dv_pos"), "left_semi")
        .drop("__dv_file", "__dv_pos")
    // a folded vector only GROWS, so resurrections (the unmasked side)
    // exist only on restore/clone-shaped commits — probe the DV-sized
    // delta once before paying a file scan for either side
    val wantMasked = dvChanged.nonEmpty && !newlyMasked.isEmpty
    val wantUnmasked = dvChanged.nonEmpty && !unmasked.isEmpty
    // ---- pre side: removed files' rows as of v-1 (their OLD vectors
    // applied), read with v's schema (physical identity is stable), plus
    // the newly-masked rows of carried files
    val preParts = Seq(
      if (removed.isEmpty) None
      else Some(readFiles(spark, dir,
        mTo.copy(files = removed,
          stats = mTo.stats ++ mFrom.stats.filter(kv => removedSet(kv._1)),
          dvs = mFrom.dvs.filter(kv => removedSet(kv._1))), removed)),
      if (wantMasked) Some(rowsAtMarks(newlyMasked)) else None
    ).flatten
    // ---- post side: added files' rows (v's vectors applied) plus any
    // vector-shrink resurrections
    val postParts = Seq(
      if (added.isEmpty) None
      else Some(readFiles(spark, dir, mTo, added)),
      if (wantUnmasked) Some(rowsAtMarks(unmasked)) else None
    ).flatten
    def side(parts: Seq[DataFrame]): DataFrame = {
      val aligned = parts.map { df =>
        // evolution null-fill: a pre-side file may predate a column
        // added at v (rawReadFiles already null-fills via the explicit
        // schema read, but partitioned/legacy paths can differ in
        // column ORDER — normalize both)
        val have = df.columns.toSet
        val filled = cols.foldLeft(df)((acc, c) =>
          if (have(c)) acc
          else acc.withColumn(c, lit(null).cast(schema(c).dataType)))
        filled.select(cols.map(c => filled(c)): _*)
      }
      aligned match {
        case Seq() =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(cols.map(c => schema(schema.fieldIndex(c)))))
        case more => more.reduce(_.unionByName(_))
      }
    }
    Some(classifyRowChanges(side(preParts), side(postParts), idCols, cols))
  }

  /** Recorded bytes one version ADDED — the streaming source's
    * `maxBytesPerTrigger` meter (round 19). One small log read: the
    * action delta carries its adds' stats inline; rewrite commits count
    * zero (the feed delivers nothing for them); a legacy SELF-CONTAINED
    * entry counts its full recorded footprint (conservative — the cap
    * can only under-batch, never over); absent sizes count zero (the
    * cap degrades toward version counting). */
  private[storage] def versionAddedBytes(spark: SparkSession, dir: String,
                                         version: Long): Long =
    readRaw(spark, dir, version) match {
      case Right(d) =>
        if (RewriteOps(d.operation)) 0L
        else d.adds.iterator.flatMap(_._2.map(_.bytes)).sum
      case Left(m) =>
        if (RewriteOps(m.operation)) 0L
        else m.stats.values.iterator.map(_.bytes).sum
    }

  /** the table's DECLARED change-feed key columns (`graft.cdfKeys`,
    * round 19) as of `version` — what `table_changes` and the streaming
    * CDF source key the boundary diff on when no explicit idCols are
    * given */
  private[graft] def declaredCdfKeys(spark: SparkSession, dir: String,
                                     version: Long): Option[Seq[String]] =
    manifest(spark, dir, version).properties.get(CdfKeysKey)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)

  /** [[readRowChanges]] behind the SQL `table_changes('t'|'path', from
    * [, to])` face (round 19): the boundary versions come from the
    * statement, the KEY columns from the table's own `graft.cdfKeys`
    * declaration — a pure-SQL consumer subscribes to row changes
    * without API plumbing. `to` defaults to the latest version. The
    * grain is this engine's native BOUNDARY DIFF (changes between the
    * two version snapshots — inserts / deletes once, updates as
    * pre+post pairs in `_change_type`), not Delta's per-commit change
    * log: a row touched at several intermediate versions reports its
    * NET change, which is what the mirror/subscribe consumers here
    * actually apply. */
  def readTableChanges(spark: SparkSession, dir: String,
                       fromVersion: Long,
                       toVersion: Option[Long] = None): DataFrame = {
    val latest = latestVersion(spark, dir)
      .getOrElse(refuse(s"no committed version at $dir"))
    val to = toVersion.getOrElse(latest)
    if (fromVersion < 1 || to > latest || fromVersion >= to)
      refuse(s"table_changes needs 1 <= fromVersion < toVersion <= " +
        s"$latest (latest), got ($fromVersion, $to)")
    val keys = declaredCdfKeys(spark, dir, to).getOrElse(refuse(
      s"table_changes needs the table's key columns — declare them " +
        s"once with ALTER TABLE ... SET TBLPROPERTIES " +
        s"('$CdfKeysKey' = '<col>[,<col>...]')"))
    readRowChanges(spark, dir, fromVersion, to, keys)
  }

  /** [[graft.operators.CorpusDiff.snapshotDiff]] across two committed
    * versions — the manifest-native form of the snapshot diff. */
  def diffVersions(spark: SparkSession, dir: String, v1: Long, v2: Long,
                   idCol: String, textCol: String): DataFrame =
    graft.operators.CorpusDiff.snapshotDiff(
      readAsOf(spark, dir, v1), readAsOf(spark, dir, v2), idCol, textCol)
}
