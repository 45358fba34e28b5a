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

  test("seeded restart: resumed stream + prefix pairs == batch on the union") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val types = Seq("view", "click", "purchase")
    val evs = (1 to 80).map(i => Ev(rnd.nextInt(4).toLong, i * 10L, i.toLong,
      types(rnd.nextInt(types.length))))
    val (first, second) = evs.splitAt(47)

    // run 1 over the prefix
    val pairs1 = run(Seq(first), "st_seed1")

    // restart: carry state = each user's LAST event of the prefix,
    // derived from the data (the recovery recipe a restart would use)
    val carries = first.groupBy(_.user).map { case (u, es) =>
      val last = es.maxBy(e => (e.et, e.eventId))
      (u, StreamingTransitions.Carry(last.et, last.eventId, last.eventType))
    }.toSeq
    val input2 = MemoryStream[Ev]
    val q2 = StreamingTransitions.transitions(input2.toDS(),
        initial = Some(carries.toDS()))
      .writeStream.format("memory").queryName("st_seed2")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    input2.addData(second); q2.processAllAvailable()
    val pairs2 = spark.table("st_seed2").as[Pair].collect()
      .map(p => (p.user, p.prevType, p.nextType)).toSeq
    q2.stop()

    val want = batchPairs(evs)
    val got = pairs1 ++ pairs2
    assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
      want.groupBy(identity).view.mapValues(_.size).toMap,
      "seeded resume diverged from the batch union")
  }

  test("within-batch unordered arrival is repaired by the event-order sort") {
    val b = Seq(Ev(1, 300, 3, "c"), Ev(1, 100, 1, "a"), Ev(1, 200, 2, "b"))
    val got = run(Seq(b), "st_unordered")
    assert(got.sorted == Seq((1L, "a", "b"), (1L, "b", "c")).sorted)
  }
}
