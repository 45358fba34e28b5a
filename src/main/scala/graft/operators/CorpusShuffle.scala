package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-data ordering — the step between a curated corpus
  * and the token stream a trainer consumes.
  *
  * Training wants (a) a global permutation that is a pure function of
  * (data, seed) — reproducible across runs, cluster sizes, and engines, so
  * a training run can be replayed bit-exactly and a resume can skip to any
  * position — and (b) optionally a CURRICULUM: coarse easy-to-hard stages,
  * shuffled within each stage. `rand()` gives neither (partition-order
  * dependent, seed semantics tied to task layout); both operators here key
  * every decision off the portable 56-bit md5 hash of (seed | doc id), the
  * same [[graft.dedup.Dedup.hexHash]] family as the samplers, so DuckDB
  * reproduces every position.
  *
  * The reference app has no ordering surface (its batches arrive in change
  * order); this is part of the [E] LLM-pipeline extension.
  */
object CorpusShuffle {

  /** Seed-stable sharded shuffle: every row gets a `shard` in
    * [0, nShards) and an exact `shard_pos` (1-based) within its shard.
    *
    * shard = hash mod nShards makes every shard a uniform random sample of
    * the corpus (no curriculum, no locality — exactly what an epoch
    * shuffle wants), and writing each shard sorted by `shard_pos` yields
    * the permutation. Scale shape: ONE hash exchange on `shard`; the
    * in-shard position is a window PARTITIONED BY shard — parallelism =
    * nShards and per-task input = corpus/nShards, so nShards is the knob
    * (at 100 TB pick it from the target shard file size, e.g. ~400k shards
    * of ~256 MB; a single-partition global window never appears). */
  def shuffle(docs: DataFrame, idCol: String, seed: String,
              nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val keyed = docs.withColumn("__key",
      graft.dedup.Dedup.hexHash(col(idCol).cast("string"), s"$seed|"))
    keyed
      .withColumn("shard", pmod(col("__key"), lit(nShards.toLong)))
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__key"), col(idCol))).cast("long"))
      .drop("__key")
  }

  /** Curriculum ordering: the exact 1-based GLOBAL position of every row
    * under `ORDER BY (stage, hash(seed|id), id)` — coarse stages first
    * (easy→hard), seed-shuffled within each stage — without the
    * single-partition global window that ordering naively plans.
    *
    * Histogram two-pass via [[GlobalRank.withRank]] (one mechanism, one
    * copy): the composite bin `stage · subBins + hash-prefix` is monotone
    * in the sort order, so every bin owns a contiguous global-position
    * interval; the bounded (≤ stages · subBins rows) driver histogram
    * becomes per-bin offsets and rows learn `offset + row_number` under a
    * window partitioned by BIN — parallelism = populated bins, per-task
    * input ≈ corpus/(stages·subBins), with `subBins` the knob.
    *
    * `stage` must be a non-negative integer column with stages in
    * [0, maxStages); rows order by it ascending. Deterministic end to end:
    * ties break on the unique id. */
  def curriculumOrder(docs: DataFrame, idCol: String, stage: Column,
                      seed: String, subBins: Int = 1 << 12,
                      maxStages: Int = 64): DataFrame = {
    require(subBins >= 1 && Integer.bitCount(subBins) == 1,
      "subBins must be a power of two")
    require(maxStages >= 1, "maxStages must be >= 1")
    // hash is uniform in [0, 2^56): its top bits are the sub-bin prefix
    val prefixShift = 56 - Integer.numberOfTrailingZeros(subBins)
    // a null stage (null quality/length column) folds to stage 0 — it has
    // to land SOMEWHERE deterministic, and "first" matches ASC NULLS FIRST
    val keyed = docs
      .withColumn("__stage", coalesce(stage.cast("long"), lit(0L)))
      .withColumn("__key",
        graft.dedup.Dedup.hexHash(col(idCol).cast("string"), s"$seed|"))
    GlobalRank.withRank(keyed,
        bin = col("__stage") * subBins + shiftright(col("__key"), prefixShift),
        order = Seq(col("__stage"), col("__key")),
        tieBreak = Seq(col(idCol)),
        maxBins = maxStages.toLong * subBins,
        emitRank = false)
      .withColumn("global_pos", col("__rn"))
      .drop("__rn", "__key", "__stage")
  }

  /** Materialize the epoch shuffle as shard FILES — the artifact a trainer
    * actually consumes: `outDir/shard=<s>/` holds one parquet file whose
    * row order IS the permutation (each shard repartitions wholly into one
    * task, then sorts by position before writing, so row-group order =
    * training order). Reading shards in shard order, rows in file order,
    * replays the permutation exactly; any shard alone is a uniform sample
    * for smoke evals. */
  def writeShards(docs: DataFrame, idCol: String, seed: String,
                  nShards: Int, outDir: String): Unit =
    shuffle(docs, idCol, seed, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.partitionBy("shard").mode("errorifexists").parquet(outDir)
}
