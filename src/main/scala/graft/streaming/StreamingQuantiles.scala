package graft.streaming

import graft.operators.QuantileSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Running quantile summary over an unbounded value stream — the streaming
  * form of [[QuantileSketch]], same pattern as the other streaming
  * sketches: the bounded multi-level compaction state IS the aggregation
  * state (O(k · log(n/k)) values — ~a few KB at k = 128 after a billion
  * inputs), so any-quantile queries stay answerable forever without the
  * state store ever holding the values themselves.
  *
  * Emit in Complete/Update mode; each trigger yields the current summary
  * row (`qs: array<array<double>>`), probed with
  * [[QuantileSketch.quantile]] driver-side or
  * [[QuantileSketch.quantileCol]] in a downstream select. */
object StreamingQuantiles {

  /** One running-summary column (`qs`) over a double stream. */
  def sketchStream(values: Dataset[Double], k: Int = 128): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    values.toDF("v")
      .select(QuantileSketch.agg(k)(col("v")).as("qs"))
  }
}
