package graft.streaming

import graft.operators.Expectations
import graft.storage.SnapshotStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Expectation-GATED ingest into the snapshot store — the contract-
  * enforcing front door of the table ([[graft.operators.Expectations]]
  * rules ∘ [[StreamingSnapshotIngest]] versioning, the Delta Live
  * Tables "expect or quarantine" shape): every batch splits row-wise on
  * the contract, PASSING rows append to the main table, VIOLATING rows
  * append to a QUARANTINE table with a `violated_rules` column naming
  * exactly which rules each row failed — nothing is dropped silently,
  * and an operator replays quarantined rows after fixing the upstream
  * (the quarantine is itself a versioned snapshot table: time travel
  * shows what was rejected when, and its change feed drives a repair
  * pipeline).
  *
  * Exactly-once across TWO stores from one at-least-once `foreachBatch`:
  * each store carries its OWN `ingest-b<batchId>` replay-guard set, so a
  * crash between the main commit and the quarantine commit redelivers
  * the batch, skips the main (already committed) side, and commits only
  * the missing quarantine side — converging to both-committed with no
  * duplicates. A side whose split is EMPTY for a batch commits nothing
  * (re-evaluating an empty split on replay is a no-op, so the guard
  * needs no tombstones).
  *
  * Scale shape: the gate is ONE codegen'd row-level projection (the
  * rule violations compile to a null-filtered literal array — no joins,
  * no aggregation except the rules the contract itself prices), the
  * split is two filtered passes over the persisted batch, and each
  * commit is the store's O(batch) append. Row-grain rules only:
  * `Unique` is keys-grain and refuses loudly (enforce uniqueness with
  * [[StreamingSnapshotIngest.startUpsert]] — the merge IS the
  * constraint). */
object GatedSnapshotIngest {

  /** Per-row array of "rule:target" labels this row violates (empty =
    * passes the contract). */
  def violatedRules(rules: Seq[Expectations.Rule]): Column = {
    require(rules.nonEmpty, "an empty contract gates nothing")
    require(!rules.exists(_.isInstanceOf[Expectations.Unique]),
      "unique is keys-grain — gate rows with value rules and enforce " +
        "keys via startUpsert's merge")
    filter(
      array(rules.map(r =>
        when(Expectations.violation(r), lit(s"${r.name}:${r.target}"))
          .otherwise(lit(null).cast("string"))): _*),
      x => x.isNotNull)
  }

  /** Split `df` on the contract: (passing rows, violating rows +
    * `violated_rules`). */
  def split(df: DataFrame,
            rules: Seq[Expectations.Rule]): (DataFrame, DataFrame) = {
    val flagged = df.withColumn("violated_rules", violatedRules(rules))
    (flagged.filter(size(col("violated_rules")) === 0).drop("violated_rules"),
      flagged.filter(size(col("violated_rules")) > 0))
  }

  /** Gate one (batch) frame and commit both sides — the same contract a
    * stream enforces, applied to a backfill/one-shot frame. Returns
    * (mainVersion, quarantineVersion); None for a side whose split was
    * empty or (when `skipMain`/`skipQuarantine`) already committed.
    * `reclaimGraceMs` keeps the store's default concurrent-writer
    * protection; the streaming path passes 0 because a checkpoint is
    * single-writer by construction — a one-shot backfill racing a live
    * gate is not, so don't. */
  def gateAndCommit(spark: SparkSession, df: DataFrame, tableDir: String,
                    quarantineDir: String, rules: Seq[Expectations.Rule],
                    op: String, skipMain: Boolean = false,
                    skipQuarantine: Boolean = false,
                    reclaimGraceMs: Long = SnapshotStore.DefaultReclaimGraceMs)
      : (Option[Long], Option[Long]) = {
    val (clean, dirty) = split(df, rules)
    val persisted = df.persist()
    try {
      val vMain =
        if (skipMain || clean.isEmpty) None
        else Some(SnapshotStore.commitAppend(spark, tableDir, clean, op,
          reclaimGraceMs = reclaimGraceMs))
      val vQuar =
        if (skipQuarantine || dirty.isEmpty) None
        else Some(SnapshotStore.commitAppend(spark, quarantineDir, dirty, op,
          reclaimGraceMs = reclaimGraceMs))
      (vMain, vQuar)
    } finally persisted.unpersist()
  }

  /** Start gated streaming ingest: each micro-batch splits on `rules`,
    * passing rows version into `tableDir`, violating rows (with
    * `violated_rules`) into `quarantineDir` — both replay-guarded per
    * store. */
  def start(docs: DataFrame, tableDir: String, quarantineDir: String,
            checkpointLocation: String,
            rules: Seq[Expectations.Rule]): StreamingQuery = {
    violatedRules(rules) // validate the contract before starting
    val spark = docs.sparkSession
    // ONE replay-guard discipline across every ingest path: the shared
    // loader keeps this gate and the plain/upsert ingest in lockstep
    val mainDone = StreamingSnapshotIngest.replayGuard(spark, tableDir)
    val quarDone = StreamingSnapshotIngest.replayGuard(spark, quarantineDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (vm, vq) = gateAndCommit(batch.sparkSession, batch, tableDir,
          quarantineDir, rules, f"ingest-b$batchId",
          skipMain = mainDone.alreadyCommitted(batchId),
          skipQuarantine = quarDone.alreadyCommitted(batchId),
          reclaimGraceMs = 0L) // single-writer per checkpoint
        if (vm.isDefined) mainDone.markCommitted(batchId)
        if (vq.isDefined) quarDone.markCommitted(batchId)
        ()
      }
      .start()
  }
}
