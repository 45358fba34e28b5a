package graft.streaming

import graft.operators.Expectations
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming data-quality contract — the standing form of
  * [[graft.operators.Expectations]]: every ROW-GRAIN rule compiles to
  * one conditional sum maintained as plain streaming aggregation state
  * (a fixed handful of longs, stream-length-independent), so the
  * contract verdict is current at every trigger and an ingest gate can
  * alarm the moment a feed starts violating. Uniqueness is deliberately
  * NOT offered here: exact distinct-count state grows with the key
  * domain — dedup a stream with [[StatefulDedup]] / [[StreamingBloomDedup]]
  * and let the batch contract audit uniqueness on the landed table.
  *
  * Replay/exactly-once: a plain streaming aggregation — checkpoint
  * recovery replays micro-batches into the same state version. */
object StreamingExpectations {

  /** Running verdicts over a streaming frame: ONE row per trigger with
    * `n_rows` and one `v_<i>` violation count per rule (list order).
    * Probe per-rule results with [[verdictRows]] on the collected row. */
  def verdicts(rows: DataFrame, rules: Seq[Expectations.Rule]): DataFrame = {
    require(rules.nonEmpty, "an empty contract checks nothing")
    require(!rules.exists(_.isInstanceOf[Expectations.Unique]),
      "uniqueness is batch-grain (unbounded distinct state); see scaladoc")
    val sums = rules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(Expectations.violation(r), 1L).otherwise(0L)),
        lit(0L)).as(s"v_$i")
    } :+ count(lit(1)).as("n_rows")
    rows.agg(sums.head, sums.tail: _*)
  }

  /** Render one collected [[verdicts]] row back to the batch operator's
    * (rule, target, n_violations, n_rows, pass) shape. */
  def verdictRows(row: org.apache.spark.sql.Row,
                  rules: Seq[Expectations.Rule])
      : Seq[(String, String, Long, Long, Boolean)] = {
    val n = row.getAs[Long]("n_rows")
    rules.zipWithIndex.map { case (r, i) =>
      val v = row.getAs[Long](s"v_$i")
      (r.name, r.target, v, n, v == 0)
    }
  }
}
