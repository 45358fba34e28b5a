package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingWindowPercentilesSpec extends SparkSpec {

  case class Ev(wstart: Long, event_type: String, cents: Long)

  private def batchReference(evs: Seq[Ev]): Map[(Long, String), (Long, Long)] =
    evs.groupBy(e => (e.wstart, e.event_type)).map { case (k, es) =>
      val vs = es.map(_.cents).sorted
      def cut(num: Long, den: Long): Long = {
        var cum = 0L
        vs.find { _ => cum += 1; cum * den >= vs.length * num }.get
      }
      k -> ((cut(1, 2), cut(19, 20)))
    }

  test("streamed histograms == batch percentiles at every fold point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(13)
    val evs = (1 to 300).map(_ => Ev(
      wstart = 600L * rnd.nextInt(3),
      event_type = Seq("a", "b")(rnd.nextInt(2)),
      cents = rnd.nextInt(10000).toLong))
    val batches = Seq(evs.slice(0, 90), evs.slice(90, 200), evs.slice(200, 300))

    val input = MemoryStream[Ev]
    val q = StreamingWindowPercentiles.histograms(input.toDF())
      .writeStream.format("memory").queryName("swp_out")
      .outputMode(OutputMode.Complete()).start()
    var seen = Seq.empty[Ev]
    batches.foreach { b =>
      input.addData(b); q.processAllAvailable()
      seen = seen ++ b
      val got = spark.table("swp_out").collect().map { r =>
        val hist = r.getAs[Map[Long, Long]]("hist")
        ((r.getLong(0), r.getString(1)),
          (StreamingWindowPercentiles.percentile(hist, 1, 2),
            StreamingWindowPercentiles.percentile(hist, 19, 20)))
      }.toMap
      assert(got == batchReference(seen),
        s"fold point after ${seen.length} events diverged")
    }
    q.stop()
  }

  test("percentile probe follows the rank-cut convention") {
    val hist = Map(10L -> 4L, 20L -> 4L, 30L -> 2L) // n=10
    assert(StreamingWindowPercentiles.percentile(hist, 1, 2) == 20L)  // ceil(5)=5th smallest
    assert(StreamingWindowPercentiles.percentile(hist, 19, 20) == 30L) // ceil(9.5)=10th
    assert(StreamingWindowPercentiles.percentile(hist, 2, 5) == 10L)  // ceil(4)=4th
  }
}
