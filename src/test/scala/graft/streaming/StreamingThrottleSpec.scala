package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingThrottleSpec extends SparkSpec {
  import StreamingThrottle.Stamped

  private val SixHoursMs = 360L * 60000

  test("first event per key per window passes; in-window duplicates drop across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stamped[String, String]]
    val q = StreamingThrottle.throttle(input.toDS(), SixHoursMs)
      .writeStream.format("memory").queryName("throttle_out")
      .outputMode(OutputMode.Update()).start()

    // batch 1: t opens the window at minute 0; minute-10 duplicate drops;
    // other key unaffected
    input.addData(
      Stamped("t", 0L, "first"),
      Stamped("t", 10 * 60000L, "dup-in-window"),
      Stamped("u", 0L, "other-key"))
    q.processAllAvailable()
    // batch 2: still inside t's window (minute 359) -> drops; minute 361
    // re-opens -> passes
    input.addData(
      Stamped("t", 359 * 60000L, "still-inside"),
      Stamped("t", 361 * 60000L, "window-elapsed"))
    q.processAllAvailable()
    val rows = spark.table("throttle_out").as[Stamped[String, String]].collect()
      .map(s => (s.key, s.value)).toSet
    q.stop()
    assert(rows == Set(("t", "first"), ("u", "other-key"), ("t", "window-elapsed")),
      s"got $rows")
  }

  test("unordered events inside one batch throttle deterministically (event order)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stamped[String, String]]
    val q = StreamingThrottle.throttle(input.toDS(), SixHoursMs)
      .writeStream.format("memory").queryName("throttle_unordered")
      .outputMode(OutputMode.Update()).start()
    // arrival order reversed: the EARLIEST event must be the one that passes
    input.addData(
      Stamped("t", 100 * 60000L, "later"),
      Stamped("t", 0L, "earliest"))
    q.processAllAvailable()
    val rows = spark.table("throttle_unordered").as[Stamped[String, String]].collect()
      .map(_.value).toSet
    q.stop()
    assert(rows == Set("earliest"), s"got $rows")
  }

  test("equal-timestamp ties break on the value, not arrival order (replay-safe)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stamped[String, String]]
    val q = StreamingThrottle.throttle(input.toDS(), SixHoursMs)
      .writeStream.format("memory").queryName("throttle_ties")
      .outputMode(OutputMode.Update()).start()
    // same key, same millisecond: a checkpoint replay may deliver these in
    // either order, so the winner must be a pure function of the DATA —
    // the lexicographically-smaller value
    input.addData(
      Stamped("t", 0L, "zzz-arrived-first"),
      Stamped("t", 0L, "aaa-arrived-second"))
    q.processAllAvailable()
    val rows = spark.table("throttle_ties").as[Stamped[String, String]].collect()
      .map(_.value).toSet
    q.stop()
    assert(rows == Set("aaa-arrived-second"), s"got $rows")
  }

  test("throttleExpiring: same decisions, but closed-window state is evicted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stamped[String, String]]
    val q = StreamingThrottle.throttleExpiring(input.toDS(), SixHoursMs, "1 minute")
      .writeStream.format("memory").queryName("throttle_expiring")
      .outputMode(OutputMode.Update()).start()

    // times start at minute 60: the epoch-0 initial watermark treats a
    // t=0 event as late and silently drops it
    // t opens a window at minute 60; in-window duplicate drops
    input.addData(
      Stamped("t", 60 * 60000L, "first"),
      Stamped("t", 70 * 60000L, "dup-in-window"))
    q.processAllAvailable()
    // u's much-later event drives the watermark far past t's deadline
    // (minute 420): t's state must be evicted on the following batch
    input.addData(Stamped("u", 1000 * 60000L, "advancer"))
    q.processAllAvailable()
    input.addData(Stamped("u", 1001 * 60000L, "dup-u")) // triggers timeout processing
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    // t re-opens after eviction exactly as a first event would
    input.addData(Stamped("t", 1002 * 60000L, "reopened"))
    q.processAllAvailable()
    val rows = spark.table("throttle_expiring").as[Stamped[String, String]].collect()
      .map(_.value).toSet
    q.stop()
    assert(rows == Set("first", "advancer", "reopened"), s"got $rows")
    assert(stateRows == 1L,
      s"closed window for 't' must be evicted, leaving only 'u' in state; got $stateRows rows")
  }

  test("both variants reject a non-positive window up front") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Stamped[String, String]]
    // windowMillis = 0 would otherwise fail deep inside the state store
    // (setTimeoutTimestamp at the watermark) — fail fast at plan time instead
    intercept[IllegalArgumentException](StreamingThrottle.throttle(input.toDS(), 0L))
    intercept[IllegalArgumentException](StreamingThrottle.throttle(input.toDS(), -1L))
    intercept[IllegalArgumentException](
      StreamingThrottle.throttleExpiring(input.toDS(), 0L, "1 minute"))
  }
}
