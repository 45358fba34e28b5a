package graft.streaming

import graft.operators.{AllowlistProjection, ChangeFeed}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming delivery of change batches (T1-T4, T9).
  *
  * Reference semantics mapped onto Spark streaming primitives:
  *  - per-table polling stream with batch caps (T1: poll interval 5000 ms,
  *    MaxBatchSize — local.settings.json:8-10) → `Trigger.ProcessingTime` +
  *    `maxFilesPerTrigger`;
  *  - high-water-mark checkpoint, advance-on-success-only, redeliver on
  *    failure (T2 — README.md:19-23) → `checkpointLocation` offset/commit
  *    logs: a failed `foreachBatch` body keeps the offset uncommitted, so
  *    the same batch replays;
  *  - at-most-latest-state per key within a delivery (T3 — README.md:5) →
  *    dedup-to-latest inside the batch body;
  *  - one stream per table, checkpoint keyed by table (T4), singleton query
  *    name (T8);
  *  - idempotent redelivery (T9): per-PK latest-state payloads make the
  *    delivery an upsert.
  */
object ChangeStream {

  /** Per-table stream config; defaults mirror the reference envelope. */
  case class StreamConfig(
      table: String,
      pollIntervalMs: Long = 5000,
      maxFilesPerTrigger: Int = 10,
      pk: Seq[String] = Seq("id"),
      versionCol: String = "version",
      allowlistConfig: Option[String] = None,
      allowlistClient: Option[String] = None,
      availableNow: Boolean = false) // drain-and-stop (tests/backfills)

  /** Start the delivery stream for one table: new parquet files appearing
    * under `sourceDir` are the change feed (each file = a committed change
    * set, the snapshot-diff shape of ChangeFeed.diff); every micro-batch is
    * deduped to latest state per PK, allowlist-projected, and handed to
    * `deliver`. A `deliver` failure fails the batch → offsets stay
    * uncommitted → the extension's redelivery semantics. */
  def start(spark: SparkSession, sourceDir: String, checkpointDir: String,
            schema: StructType, cfg: StreamConfig)
           (deliver: (DataFrame, Long) => Unit): StreamingQuery = {
    val source = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(sourceDir)

    val trigger =
      if (cfg.availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime(cfg.pollIntervalMs)

    source.writeStream
      .queryName(s"graft_delivery_${cfg.table}")
      .option("checkpointLocation", s"$checkpointDir/${cfg.table}")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val latest = ChangeFeed.dedupLatest(batch, cfg.pk, cfg.versionCol)
        val projected = AllowlistProjection(
          latest, cfg.allowlistConfig, cfg.allowlistClient)
        deliver(projected, batchId)
      }
      .start()
  }
}
