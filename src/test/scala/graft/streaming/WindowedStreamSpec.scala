package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class WindowedStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("event_type", StringType)))

  private def ns(minutes: Long): Long = minutes * 60L * 1000000000L

  test("watermark: on-time windows aggregate; too-late events are dropped") {
    import spark.implicits._
    val src = Files.createTempDirectory("wm-src").toString
    val ckp = Files.createTempDirectory("wm-ckp").toString
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Map[(Long, String), Long])]()

    // Late-event filtering uses the PREVIOUS batch's watermark
    // (SPARK-40925), so a watermark advanced in batch N drops late rows
    // from batch N+2 onward:
    //   f1 (batch0): minutes 5, 55   -> watermark after batch: 50
    //   f2 (batch1): minutes 6, 56   -> late filter still 0: minute-6 counts;
    //                                   eviction (50) drops window-0 state
    //   f3 (batch2): minutes 7, 57   -> late filter now 50: minute-7 DROPPED
    Seq((1L, ns(5), "click"), (2L, ns(55), "click"))
      .toDF("event_id", "ts", "event_type").coalesce(1).write.parquet(s"$src/f1")
    Thread.sleep(1100) // distinct mod times => deterministic file order
    Seq((3L, ns(6), "click"), (4L, ns(56), "click"))
      .toDF("event_id", "ts", "event_type").coalesce(1).write.parquet(s"$src/f2")
    Thread.sleep(1100)
    Seq((5L, ns(7), "click"), (6L, ns(57), "click"))
      .toDF("event_id", "ts", "event_type").coalesce(1).write.parquet(s"$src/f3")

    val q = WindowedStream.eventCounts(spark, s"$src/*", ckp, schema) { (df, id) =>
      batches.add(id -> df.collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap)
    }
    q.awaitTermination(90000)

    val all = batches.toArray(Array.empty[(Long, Map[(Long, String), Long])]).toMap
    assert(all.size >= 3, s"expected >=3 micro-batches, got ${all.keySet}")
    // batch 0: both windows appear (minute-5 window = wstart 0, minute-55 = 3000)
    assert(all(0L) == Map((0L, "click") -> 1L, (3000L, "click") -> 1L), s"got ${all(0L)}")
    // batch 1: watermark filter lags one batch — minute-6 still updates
    assert(all(1L) == Map((0L, "click") -> 2L, (3000L, "click") -> 2L), s"got ${all(1L)}")
    // batch 2: minute-7 is dropped (late filter = 50), only on-time update
    assert(all(2L) == Map((3000L, "click") -> 3L), s"late event leaked: ${all(2L)}")
  }
}
