package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingTransitionsSpec extends SparkSpec {
  import StreamingTransitions.{Ev, Pair}

  /** Batch reference: per-user lag pairs in (et, eventId) order. */
  private def batchPairs(evs: Seq[Ev]): Seq[(Long, String, String)] =
    evs.groupBy(_.user).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e.et, e.eventId)).sliding(2).collect {
        case Seq(a, b) => (u, a.eventType, b.eventType)
      }
    }

  private def run(batches: Seq[Seq[Ev]], name: String): Seq[(Long, String, String)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingTransitions.transitions(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    val rows = spark.table(name).as[Pair].collect()
      .map(p => (p.user, p.prevType, p.nextType)).toSeq
    q.stop()
    rows
  }

  test("boundary pair across batches is emitted exactly once") {
    val b1 = Seq(Ev(1, 100, 1, "view"), Ev(1, 200, 2, "click"))
    val b2 = Seq(Ev(1, 300, 3, "purchase"))
    val got = run(Seq(b1, b2), "st_boundary")
    assert(got.sorted == Seq(
      (1L, "view", "click"), (1L, "click", "purchase")).sorted)
  }

  test("streamed pair multiset == batch lag pairs at every fold point") {
    val rnd = new scala.util.Random(5)
    val types = Seq("view", "click", "purchase", "error")
    val evs = (1 to 120).map { i =>
      Ev(user = rnd.nextInt(6).toLong, et = i * 10L, eventId = i.toLong,
        eventType = types(rnd.nextInt(types.length)))
    }
    // ordered arrival: split the event-time-ordered stream at arbitrary cuts
    val batches = Seq(evs.slice(0, 17), evs.slice(17, 58), evs.slice(58, 120))
    val got = run(batches, "st_fold")
    val want = batchPairs(evs)
    assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
      want.groupBy(identity).view.mapValues(_.size).toMap)
  }

  test("within-batch unordered arrival is repaired by the event-order sort") {
    val b = Seq(Ev(1, 300, 3, "c"), Ev(1, 100, 1, "a"), Ev(1, 200, 2, "b"))
    val got = run(Seq(b), "st_unordered")
    assert(got.sorted == Seq((1L, "a", "b"), (1L, "b", "c")).sorted)
  }
}
