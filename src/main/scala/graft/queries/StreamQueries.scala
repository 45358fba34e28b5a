package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.9 streaming semantics, batch analogues (T-rows + TX).
  *
  * These use the same operators Structured Streaming plans (`window`,
  * `session_window`, keyed dedup) executed on the batch events table, so the
  * semantics carry to `readStream` unchanged (see graft.streaming for the
  * foreachBatch wrappers). events.ts is epoch-nanos bigint (see Tables);
  * all window math is done on floor-seconds so the DuckDB oracle can
  * reproduce it exactly.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  private def withEpochTs(df: DataFrame): DataFrame =
    df.withColumn("et", Tables.tsEpochSeconds)
      .withColumn("tss", timestamp_seconds(col("et")))

  /** TX — tumbling 10-minute window aggregation (the real `window` operator). */
  def txTumblingWindow(s: SparkSession, d: String): DataFrame =
    withEpochTs(Tables.events(s, d))
      .groupBy(window(col("tss"), "600 seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("wstart", "event_type")

  /** TX — sliding 10-minute window, 5-minute slide (each event in 2 windows). */
  def txSlidingWindow(s: SparkSession, d: String): DataFrame =
    withEpochTs(Tables.events(s, d))
      .groupBy(window(col("tss"), "600 seconds", "300 seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"), col("cnt"))
      .orderBy("wstart", "event_type")

  /** TX — session window, 30-minute gap, per user (the real `session_window`
    * operator; merges events whose gap to the previous is < 1800 s). */
  def txSessionWindow(s: SparkSession, d: String): DataFrame =
    withEpochTs(Tables.events(s, d))
      .groupBy(session_window(col("tss"), "1800 seconds").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** T7 — notification throttle: within each (user, 6 h bucket), only the
    * first event notifies; the rest are suppressed (NotifyFunctions.cs:29-34
    * batch analogue). */
  def t7ThrottleWindow(s: SparkSession, d: String): DataFrame = {
    // ONE aggregation instead of two windows + filter: min_by picks the
    // first event per (user, bucket) and count tallies the suppressed rest,
    // both with map-side partial combining — the window formulation shuffled
    // and sorted every event per key
    val bucketed = withEpochTs(Tables.events(s, d))
      .withColumn("bucket_start", (col("et") - (col("et") % 21600)).cast("long"))
    bucketed
      .groupBy(col("user_id"), col("bucket_start"))
      .agg(
        min_by(col("event_id"), struct(col("et"), col("event_id"))).as("notify_event_id"),
        (count(lit(1)) - 1).cast("long").as("suppressed"))
      .orderBy("user_id", "bucket_start")
  }

  /** T9 — idempotent redelivery dedup: duplicate (user, type, payload-key)
    * deliveries collapse to the first occurrence (deterministic min id, not
    * dropDuplicates, whose survivor is partition-order dependent). */
  def t9IdempotentDedup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("user_id"), col("event_type"), col("k"))
      .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n_deliveries"))
      .orderBy("user_id", "event_type", "k")

  val queries: Map[String, Q] = Map(
    "tx_tumbling_window" -> (txTumblingWindow _),
    "tx_sliding_window" -> (txSlidingWindow _),
    "tx_session_window" -> (txSessionWindow _),
    "t7_throttle_window" -> (t7ThrottleWindow _),
    "t9_idempotent_dedup" -> (t9IdempotentDedup _),
  )

  val oracle: Map[String, String] = Map(
    "tx_tumbling_window" ->
      """SELECT (epoch_ms(ts) // 1000 // 600) * 600 AS wstart, event_type,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin,
    "tx_sliding_window" ->
      """WITH e AS (SELECT epoch_ms(ts) // 1000 AS et, event_type FROM events),
        |w AS (
        |  SELECT (et // 300) * 300 AS wstart, event_type, et FROM e
        |  UNION ALL
        |  SELECT (et // 300) * 300 - 300 AS wstart, event_type, et FROM e)
        |SELECT wstart, event_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM w WHERE et >= wstart AND et < wstart + 600
        |GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin,
    "tx_session_window" ->
      """WITH e AS (
        |  SELECT user_id, value, epoch_ms(ts) // 1000 AS et, event_id FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN et - lag(et) OVER (PARTITION BY user_id ORDER BY et, event_id) >= 1800
        |                 OR lag(et) OVER (PARTITION BY user_id ORDER BY et, event_id) IS NULL
        |            THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY et, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, min(et) AS session_start,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 2) AS sum_value
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "t7_throttle_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) // 1000 AS et,
        |         (epoch_ms(ts) // 1000) - ((epoch_ms(ts) // 1000) % 21600) AS bucket_start
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, bucket_start ORDER BY et, event_id) AS rn,
        |         count(*) OVER (PARTITION BY user_id, bucket_start) AS n_in_bucket
        |  FROM e)
        |SELECT user_id, bucket_start, event_id AS notify_event_id,
        |       CAST(n_in_bucket - 1 AS BIGINT) AS suppressed
        |FROM ranked WHERE rn = 1
        |ORDER BY user_id, bucket_start""".stripMargin,
    "t9_idempotent_dedup" ->
      """SELECT user_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       min(event_id) AS first_event_id,
        |       CAST(count(*) AS BIGINT) AS n_deliveries
        |FROM events GROUP BY user_id, event_type, k
        |ORDER BY user_id, event_type, k""".stripMargin,
  )
}
