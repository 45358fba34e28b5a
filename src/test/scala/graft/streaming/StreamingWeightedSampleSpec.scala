package graft.streaming

import graft.SparkSpec
import graft.operators.WeightedSample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

class StreamingWeightedSampleSpec extends SparkSpec {

  private val corpus = (1L to 40L).map(i => (i, (i % 13 + 1).toDouble * 10))

  private def sampleOf(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq

  test("streamed sample equals the batch priority sample at every fold point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("ws-ckpt").toString
    val (q, handle) = StreamingWeightedSample.start(
      input.toDF().toDF("doc_id", "weight"), ckpt, "doc_id", "weight", n = 7)

    def batchSample(upTo: Int) = sampleOf(WeightedSample.prioritySample(
      corpus.take(upTo).toDF("doc_id", "weight"), "doc_id", col("weight"), 7))

    input.addData(corpus.take(5): _*) // fewer than n: exact regime, τ = 0
    q.processAllAvailable()
    assert(sampleOf(handle.currentSample.get) == batchSample(5))
    input.addData(corpus.slice(5, 25): _*)
    q.processAllAvailable()
    assert(sampleOf(handle.currentSample.get) == batchSample(25))
    input.addData(corpus.drop(25): _*)
    q.processAllAvailable()
    assert(sampleOf(handle.currentSample.get) == batchSample(40))
    q.stop()
  }

  test("replayed rows are a no-op; a seeded restart continues the fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("ws-ckpt2").toString
    val (q, handle) = StreamingWeightedSample.start(
      input.toDF().toDF("doc_id", "weight"), ckpt, "doc_id", "weight", n = 7)
    input.addData(corpus.take(25): _*)
    q.processAllAvailable()
    input.addData(corpus.take(25): _*) // full replay: identical rows dedup
    q.processAllAvailable()
    val afterReplay = sampleOf(handle.currentSample.get)
    val state = handle.currentTopRows.get
    q.stop()
    assert(afterReplay == sampleOf(WeightedSample.prioritySample(
      corpus.take(25).toDF("doc_id", "weight"), "doc_id", col("weight"), 7)))

    // "restart": a fresh query seeded with the persisted state folds the
    // remaining rows to the uninterrupted result
    val input2 = MemoryStream[(Long, Double)]
    val ckpt2 = java.nio.file.Files.createTempDirectory("ws-ckpt3").toString
    val (q2, handle2) = StreamingWeightedSample.start(
      input2.toDF().toDF("doc_id", "weight"), ckpt2, "doc_id", "weight",
      n = 7, initialState = Some(state))
    input2.addData(corpus.drop(25): _*)
    q2.processAllAvailable()
    val resumed = sampleOf(handle2.currentSample.get)
    q2.stop()
    assert(resumed == sampleOf(WeightedSample.prioritySample(
      corpus.toDF("doc_id", "weight"), "doc_id", col("weight"), 7)),
      "seeded resume must equal the uninterrupted run")
  }
}
