package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** EXACT windowed percentiles over an unbounded stream — the streaming
  * form of `SeqQueries.eWindowPercentiles`: per (window, type) group the
  * aggregation state is the integer VALUE-COUNT histogram (domain-
  * bounded — e.g. distinct cents of a price/latency domain — independent
  * of stream length), merged associatively and commutatively, so the
  * running p50/p95 are exact at every trigger, not sketch-approximate.
  * This is the spot the quantile SKETCH does not cover: when the value
  * domain is bounded (money at cent grain, latencies at ms grain), the
  * exact histogram costs less than the sketch and has zero rank error.
  *
  * Replay/exactly-once: this is a plain streaming AGGREGATION (the
  * histogram Aggregator runs inside the engine's stateful agg), so
  * checkpoint recovery replays micro-batches into the SAME state
  * version — no batch-id cursor needed, unlike the foreachBatch folds.
  *
  * Probe with [[percentile]] (rank-cut convention shared with the batch
  * oracle: smallest value whose cumulative count reaches ceil(p·n)). */
object StreamingWindowPercentiles {

  /** Histogram aggregator: Map(value → count), bounded by the value
    * domain. Merge is map-sum — associative and commutative. */
  class HistAgg extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(m: Map[Long, Long], v: Long): Map[Long, Long] =
      m.updated(v, m.getOrElse(v, 0L) + 1L)
    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      b.foldLeft(a) { case (acc, (v, c)) => acc.updated(v, acc.getOrElse(v, 0L) + c) }
    override def finish(m: Map[Long, Long]): Map[Long, Long] = m
    // structured (MapType) encoders — the emitted column is a real map,
    // not a kryo blob, so downstream selects and tests read it directly
    override def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  }

  /** Rank-cut percentile from a finished histogram: smallest value whose
    * cumulative count reaches ceil(p·n) — percentile_disc, identical to
    * the batch query's convention. */
  def percentile(hist: Map[Long, Long], pNum: Long, pDen: Long): Long = {
    require(hist.nonEmpty, "empty histogram")
    val total = hist.values.sum
    val sorted = hist.toSeq.sortBy(_._1)
    var cum = 0L
    sorted.find { case (_, c) =>
      cum += c
      cum * pDen >= total * pNum
    }.map(_._1).getOrElse(sorted.last._1)
  }

  /** Running per-(window, type) histograms over a streaming frame with
    * (wstart: long, event_type: string, cents: long). Update/Complete
    * output mode; one row per touched group per trigger with the
    * current exact histogram. */
  def histograms(events: DataFrame): DataFrame = {
    events.groupBy(col("wstart"), col("event_type"))
      .agg(udaf(new HistAgg).apply(col("cents")).as("hist"),
        count(lit(1)).as("n_events"))
  }
}
