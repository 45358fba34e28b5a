package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulDedupSpec extends SparkSpec {
  import StatefulDedup.Keyed

  test("cross-batch latest-only: older/equal versions suppressed across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Keyed[Long, String]]
    val q = StatefulDedup.latestOnly(input.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode(OutputMode.Update()).start()

    // batch 1: two versions of key 1 -> only v2 emits
    input.addData(Keyed(1L, 1L, "a1"), Keyed(1L, 2L, "a2"), Keyed(2L, 5L, "b5"))
    q.processAllAvailable()
    // batch 2: redelivery of old versions + one advance
    input.addData(Keyed(1L, 2L, "a2-redelivered"), Keyed(2L, 4L, "b4-late"), Keyed(2L, 6L, "b6"))
    q.processAllAvailable()
    val rows = spark.table("latest_out").as[Keyed[Long, String]].collect()
      .map(k => (k.key, k.version, k.value)).toSet
    q.stop()
    assert(rows == Set((1L, 2L, "a2"), (2L, 5L, "b5"), (2L, 6L, "b6")), s"got $rows")
  }

  test("equal-version ties break on the value, not arrival order (replay-safe)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Keyed[Long, String]]
    val q = StatefulDedup.latestOnly(input.toDS())
      .writeStream.format("memory").queryName("latest_ties")
      .outputMode(OutputMode.Update()).start()
    // same key, same version, different values in one batch: a checkpoint
    // replay may reorder them, so the winner must be a pure function of the
    // DATA — the lexicographically-largest value
    input.addData(Keyed(1L, 7L, "zzz-first-arrival"), Keyed(1L, 7L, "aaa-second"))
    q.processAllAvailable()
    val rows = spark.table("latest_ties").as[Keyed[Long, String]].collect()
      .map(_.value).toSet
    q.stop()
    assert(rows == Set("zzz-first-arrival"), s"got $rows")
  }

  test("works identically on a batch Dataset (same code path, no stream)") {
    import spark.implicits._
    val ds = Seq(Keyed(1L, 3L, "x3"), Keyed(1L, 1L, "x1"), Keyed(2L, 1L, "y1")).toDS()
    val out = StatefulDedup.latestOnly(ds).collect().map(k => (k.key, k.version)).toSet
    assert(out == Set((1L, 3L), (2L, 1L)))
  }
}
