package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class DriftRow(is_a: Boolean, v: Long)

class StreamingDriftSpec extends SparkSpec {

  test("streamed KS verdict == batch ksTest at every fold point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // slice A uniform 0..9; slice B shifted upward (drifted)
    val rows = (1 to 300).map { i =>
      val a = i % 2 == 0
      DriftRow(a, if (a) rnd.nextInt(10).toLong else 3L + rnd.nextInt(10))
    }
    val batches = Seq(rows.slice(0, 100), rows.slice(100, 220),
      rows.slice(220, 300))

    val input = MemoryStream[DriftRow]
    val q = StreamingDrift.sliceHistograms(input.toDF())
      .writeStream.format("memory").queryName("sd_out")
      .outputMode(OutputMode.Complete()).start()
    var seen = Seq.empty[DriftRow]
    batches.foreach { b =>
      input.addData(b); q.processAllAvailable()
      seen = seen ++ b
      val hists = spark.table("sd_out").collect()
        .map(r => r.getBoolean(0) -> r.getAs[Map[Long, Long]]("hist")).toMap
      val (d, crit, rej) = StreamingDrift.ks(hists(true), hists(false))
      // batch reference on the same prefix
      val ref = graft.operators.StatTests
        .ksTest(seen.toDF(), "v", col("is_a"))
        .select(col("ks_d"), col("ks_crit"), col("reject"))
        .as[(Double, Double, Boolean)].head()
      assert(math.abs(d - ref._1) < 5e-7, s"D: $d vs ${ref._1}")
      assert(math.abs(crit - ref._2) < 5e-7)
      assert(rej == ref._3)
    }
    q.stop()
  }

  test("ks probe demands both slices") {
    intercept[IllegalArgumentException] {
      StreamingDrift.ks(Map(1L -> 1L), Map.empty)
    }
  }
}
