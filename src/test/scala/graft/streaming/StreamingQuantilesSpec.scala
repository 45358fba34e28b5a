package graft.streaming

import graft.SparkSpec
import graft.operators.QuantileSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingQuantilesSpec extends SparkSpec {

  test("running summary accumulates across micro-batches; quantiles track") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Double]
    val q = StreamingQuantiles.sketchStream(input.toDS(), k = 64)
      .writeStream.format("memory").queryName("qs_out")
      .outputMode(OutputMode.Complete()).start()

    def summary(): Array[Array[Double]] =
      spark.table("qs_out").head()
        .getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
        .map(_.toArray).toArray

    input.addData((1 to 500).map(_.toDouble): _*)
    q.processAllAvailable()
    assert(QuantileSketch.count(summary()) == 500)
    val m1 = QuantileSketch.quantile(summary(), 0.5)
    assert(math.abs(m1 - 250) <= 500 * 0.06, s"median after batch 1: $m1")

    // batch 2 shifts the distribution upward; the running state must follow
    input.addData((501 to 2000).map(_.toDouble): _*)
    q.processAllAvailable()
    val s2 = summary()
    q.stop()
    assert(QuantileSketch.count(s2) == 2000, "state must span both batches")
    val m2 = QuantileSketch.quantile(s2, 0.5)
    assert(math.abs(m2 - 1000) <= 2000 * 0.06, s"median after batch 2: $m2")
    val p99 = QuantileSketch.quantile(s2, 0.99)
    assert(math.abs(p99 - 1980) <= 2000 * 0.06, s"p99 after batch 2: $p99")
  }
}
