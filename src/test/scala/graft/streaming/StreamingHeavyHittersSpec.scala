package graft.streaming

import graft.SparkSpec
import graft.operators.CountMinSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingHeavyHittersSpec extends SparkSpec {

  test("running sketch equals the batch sketch over everything seen so far") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val (depth, width) = (4, 32)
    val input = MemoryStream[String]
    val q = StreamingHeavyHitters.sketchStream(input.toDS(), depth, width)
      .writeStream.format("memory").queryName("cms_run")
      .outputMode(OutputMode.Complete()).start()
    try {
      val batch1 = Seq("the", "the", "a", "b", "the")
      input.addData(batch1: _*)
      q.processAllAvailable()
      def current(): Seq[Long] =
        spark.table("cms_run").as[Seq[Long]].collect().last
      def batchBuilt(toks: Seq[String]): Seq[Long] =
        CountMinSketch.build(toks.toDF("token"), "token", depth, width).toSeq
      assert(current() == batchBuilt(batch1))

      // state carries across micro-batches: batch 2 merges, never resets
      val batch2 = Seq("a", "a", "c", "the")
      input.addData(batch2: _*)
      q.processAllAvailable()
      assert(current() == batchBuilt(batch1 ++ batch2))

      // and the merged sketch estimates stay one-sided vs exact counts
      val cms = current().toArray
      val exact = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size)
      exact.foreach { case (t, n) =>
        val est = Seq(t).toDF("token")
          .select(CountMinSketch.estimate(cms, depth, width)(
            org.apache.spark.sql.functions.col("token")).as("e"))
          .as[Long].head()
        assert(est >= n, s"token $t exact=$n est=$est")
      }
    } finally q.stop()
  }
}
