package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Watermarked tumbling-window aggregation over the event stream (TX row:
  * windows + watermark). The batch analogues in StreamQueries share the
  * window math; this is the true streaming form with bounded state:
  * `withWatermark` lets Spark drop window state once the event-time
  * watermark passes the window end, and discards late events beyond the
  * delay — the knob that keeps state finite on an unbounded 100 TB/day
  * stream. */
object WindowedStream {

  /** Per-(window, event_type) counts in update mode; events later than
    * `watermarkDelay` behind the max seen event time are dropped. */
  def eventCounts(spark: SparkSession, sourceDir: String, checkpointDir: String,
                  schema: StructType, windowDuration: String = "10 minutes",
                  watermarkDelay: String = "5 minutes",
                  maxFilesPerTrigger: Int = 1)
                 (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      // events.ts convention: epoch-nanos bigint (see graft.Tables)
      .withColumn("tss", timestamp_seconds(expr("ts DIV 1000000000")))
      .withWatermark("tss", watermarkDelay)

    src.groupBy(window(col("tss"), windowDuration).as("w"), col("event_type"))
      .count()
      .select(unix_timestamp(col("w.start")).as("wstart"), col("event_type"), col("count"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(sink)
      .start()
  }
}
