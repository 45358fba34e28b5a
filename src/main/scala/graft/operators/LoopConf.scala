package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive shuffle sizing for ITERATIVE DataFrame loops (the
  * graph family: connected components, PageRank, label propagation,
  * k-core, triangles).
  *
  * A loop of R rounds runs ~3-5 exchanges per round; with the session's
  * fixed `spark.sql.shuffle.partitions` every one of those stages
  * schedules that many tasks no matter how small the loop state is, and
  * the per-task constants — closure deserialization, shuffle-file
  * creation and the bypass-merge file copy — dominate a kilobyte-sized
  * graph by orders of magnitude (measured on the sf0.1 near-dup graph:
  * 34 executor-CPU-seconds for a 3-iteration PageRank over 16k edges at
  * 32 partitions vs 0.6 at size-fitted partitioning). AQE's coalescing
  * only repairs the READ side; the map side still writes one file per
  * configured partition, so the fix must size the shuffle itself.
  *
  * [[partitionsFor]] derives the loop's partition count from the
  * measured WORK BYTES (rows x estimated row width) against the
  * session's own AQE advisory partition size — the "derive from input
  * size" discipline: a toy graph collapses to single-task stages while
  * a 100 TB edge set keeps every partition the session config would
  * have given it (the result is clamped to the session's configured
  * count, so at scale this NEVER reduces parallelism below today's).
  *
  * [[scoped]] applies the count for the duration of one loop via the
  * session conf (SQLConf has no per-job scope), serialized by a global
  * lock so overlapping loops on one session cannot interleave their
  * set/restore pairs — the connectedComponents discipline, shared. It
  * also disables AQE's parallelism-first coalescing inside the scope so
  * the post-shuffle side coalesces to the SAME advisory target the
  * partition count was derived from.
  */
private[graft] object LoopConf {

  private val lock = new Object

  /** estimated serialized bytes per symmetric (long, long) edge row in a
    * shuffle — 2x8 data + row/codec overhead + the x2 symmetric explode
    * most loops apply; deliberately generous so the clamp errs towards
    * parallelism */
  val EdgeRowBytes: Long = 64L

  /** Per-task byte target for LOOP stages — deliberately smaller than
    * the scan-oriented 64 MB AQE advisory: a loop round's reduce side is
    * a CPU-heavy sort/join/window over already-compact fixed-width rows,
    * where ~8 MB of work (~100 ms) amortizes the ~10 ms per-task
    * constants while still fanning a mid-sized working set across the
    * machine's cores (measured on memo:suffixRanks at sf0.1: the 64 MB
    * divisor collapsed a 35 MB / 12-round loop to ONE task per stage and
    * cost +50% wall vs the session default; 8 MB lands near the optimum
    * — see OPTIMIZATION_r21.md). At 100 TB the clamp to the session's
    * own partition count binds long before this target does, so
    * production partitioning is unchanged. Override per deployment with
    * `spark.graft.loop.taskBytes`. */
  val DefaultLoopTaskBytes: Long = 8L * 1024 * 1024

  private[graft] def loopTaskBytes(spark: SparkSession): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.graft.loop.taskBytes",
        sys.env.getOrElse("SPARK_GRAFT_LOOP_TASK_BYTES",
          DefaultLoopTaskBytes.toString)))
    catch { case scala.util.control.NonFatal(_) => DefaultLoopTaskBytes }

  /** partition count for a loop whose per-round working set is
    * ~`rows x rowBytes`: ceil(bytes / loopTaskBytes), clamped to
    * [1, session's configured shuffle partitions] */
  def partitionsFor(spark: SparkSession, rows: Long,
                    rowBytes: Long = EdgeRowBytes): Int =
    partitionsForBytes(spark, math.max(0L, rows) * rowBytes)

  /** [[partitionsFor]] from a direct byte estimate. */
  def partitionsForBytes(spark: SparkSession, bytes: Long): Int = {
    val current = spark.conf.get("spark.sql.shuffle.partitions", "200")
      .trim.toInt
    val ideal = math.ceil(
      math.max(0L, bytes).toDouble / loopTaskBytes(spark).toDouble).toLong
    math.max(1L, math.min(current.toLong, ideal)).toInt
  }

  /** Estimates that size-only planning returns for an UNKNOWN leaf are
    * conf.defaultSizeInBytes-scale (Long.MaxValue-ish); anything at or
    * above this cap is "unknown", not a measurement. */
  private val UnknownBytes = 1L << 50

  /** Best JOB-FREE byte estimate of a loop input — sizing a loop must
    * not run a count() job: the extra pass shows up in the bench's
    * recordsRead counters as a fake >10% regression on every consumer
    * (measured: +15% on e_connected_components, +24% on
    * e_dedup_authority). Sources, in order of trust:
    *
    *  1. every leaf of the optimized plan measured exactly — a
    *     localCheckpointed memo's cached RDD blocks
    *     (`getRDDStorageInfo`, the blocks the loop will actually read)
    *     or a materialized cache/local relation (their stats ARE
    *     measured bytes); narrow transforms above the leaves only ever
    *     shrink the working set, so the leaf sum over-estimates — the
    *     safe direction (more partitions, clamped at the session count);
    *  2. otherwise the size-only planner estimate for the whole frame,
    *     unless it is the unknown-huge default.
    *
    * None = no usable estimate: callers keep the session's partitioning
    * (today's behavior — the scale-safe default). */
  def bytesHint(df: DataFrame): Option[Long] = try {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val plan = df.queryExecution.optimizedPlan
    val infos = df.sparkSession.sparkContext.getRDDStorageInfo
    val leaves = plan.collectLeaves()
    val exact: Seq[Option[Long]] = leaves.map {
      case lr: LogicalRDD =>
        infos.find(_.id == lr.rdd.id)
          .map(i => i.memSize + i.diskSize).filter(_ > 0L)
      case im: InMemoryRelation =>
        Some(im.stats.sizeInBytes).filter(_ < UnknownBytes).map(_.toLong)
      case lf =>
        Some(lf.stats.sizeInBytes).filter(_ < UnknownBytes).map(_.toLong)
    }
    if (leaves.nonEmpty && exact.forall(_.isDefined))
      Some(exact.flatten.sum)
    else Some(plan.stats.sizeInBytes).filter(_ < UnknownBytes).map(_.toLong)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Run `body` under loop-fitted partitioning derived from the largest
    * job-free [[bytesHint]] among `inputs`, times `factor` (callers
    * whose shuffled working set is wider than the raw input — exploded
    * gram/token tables — pass their expansion estimate; over-estimating
    * only adds partitions, the safe direction); when no input has a
    * usable hint, fall back to AQE size-based coalescing only (the
    * round-20 connectedComponents shape). */
  def scopedByInputs[T](spark: SparkSession, inputs: Seq[DataFrame],
                        factor: Double = 1.0)(body: => T): T =
    inputs.flatMap(bytesHint).maxOption match {
      case Some(b) =>
        val sized = math.ceil(b.toDouble * math.max(factor, 0.0)).toLong
        scoped(spark, partitionsForBytes(spark, sized))(body)
      case None => scopedCoalesceBySize(spark)(body)
    }

  /** Run `body` with `spark.sql.shuffle.partitions = partitions`, AQE's
    * parallelism-first coalescing off, and the AQE advisory partition
    * size lowered to the loop task target — without the advisory
    * override, read-side coalescing (which only ever MERGES partitions)
    * would fold the size-fitted map partitions straight back to the
    * 64 MB scan advisory and serialize the loop's CPU-bound reduce
    * stages. All three restored afterwards. Global lock: see the class
    * doc. Other queries racing the loop on the same session see the
    * override — benign (their exchanges size by bytes too) but
    * documented: run loops sequentially where possible. */
  def scoped[T](spark: SparkSession, partitions: Int)(body: => T): T =
    lock.synchronized {
      val conf = spark.conf
      val keys = Seq(
        "spark.sql.shuffle.partitions" -> partitions.toString,
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
          loopTaskBytes(spark).toString)
      val olds = keys.map { case (k, _) => k -> conf.getOption(k) }
      keys.foreach { case (k, v) => conf.set(k, v) }
      try body
      finally olds.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }

  /** [[scoped]] with AQE parallelism-first handling ONLY (no partition
    * override) — the historical connectedComponents shape, kept for
    * loops whose first exchange happens before any size measurement. */
  def scopedCoalesceBySize[T](spark: SparkSession)(body: => T): T =
    lock.synchronized {
      val conf = spark.conf
      val pfKey = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
      val pfOld = conf.getOption(pfKey)
      conf.set(pfKey, "false")
      try body
      finally pfOld match {
        case Some(v) => conf.set(pfKey, v)
        case None => conf.unset(pfKey)
      }
    }
}
