package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {

  // no implicit encoder for nested arrays — read summaries via the Row API
  private def summaryOf(df: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
    df.head().getAs[scala.collection.Seq[scala.collection.Seq[Double]]](0)
      .map(_.toArray).toArray

  private def rankError(data: Seq[Double], q: Double, answer: Double): Long = {
    val sorted = data.sorted
    val targetRank = math.max(1L, math.ceil(q * data.length).toLong)
    // rank range occupied by the answer value (handles duplicates)
    val lo = sorted.indexWhere(_ == answer) + 1L
    val hi = sorted.lastIndexWhere(_ == answer) + 1L
    if (targetRank < lo) lo - targetRank
    else if (targetRank > hi) targetRank - hi
    else 0L
  }

  test("small inputs (n <= k) are answered exactly") {
    import spark.implicits._
    val data = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0)
    val summary = summaryOf(data.toDS()
      .select(QuantileSketch.agg(128)(col("value")).as("qs")))
    assert(QuantileSketch.count(summary) == 10)
    assert(QuantileSketch.quantile(summary, 0.5) == 5.0)
    assert(QuantileSketch.quantile(summary, 0.1) == 1.0)
    assert(QuantileSketch.quantile(summary, 1.0) == 10.0)
  }

  test("rank error stays within the compaction bound at n >> k, any partitioning") {
    import spark.implicits._
    // deterministic pseudo-random values, adversarially non-uniform
    val n = 20000
    val data = (1 to n).map(i => ((i * 2654435761L) % 100003).toDouble)
    for (parts <- Seq(1, 8)) {
      val summary = summaryOf(data.toDS().repartition(parts)
        .select(QuantileSketch.agg(128)(col("value")).as("qs")))
      assert(QuantileSketch.count(summary) == n,
        s"summary must account for every input at $parts partitions")
      for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
        val err = rankError(data, q, QuantileSketch.quantile(summary, q))
        assert(err <= n * 0.05,
          s"q=$q at $parts partitions: rank error $err > ${n * 0.05}")
      }
    }
  }

  test("quantileCol matches the driver-side probe on grouped sketches") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 3}", (i * 37 % 211).toDouble))
      .toDF("g", "v")
    val sketches = df.groupBy(col("g"))
      .agg(QuantileSketch.agg(64)(col("v")).as("qs"))
    val viaCol = sketches
      .select(col("g"), QuantileSketch.quantileCol(col("qs"), 0.5).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaDriver = sketches.collect().map { r =>
      val s = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](1)
        .map(_.toArray).toArray
      r.getString(0) -> QuantileSketch.quantile(s, 0.5)
    }.toMap
    assert(viaCol == viaDriver)
  }

  test("summary size stays bounded: O(k log(n/k)) values, not O(n)") {
    import spark.implicits._
    val n = 50000
    val summary = summaryOf((1 to n).map(_.toDouble).toDS()
      .select(QuantileSketch.agg(128)(col("value")).as("qs")))
    val stored = summary.map(_.length).sum
    assert(stored <= 128 * (2 + (math.log(n / 128.0) / math.log(2)).toInt),
      s"stored $stored values for $n inputs — state must stay logarithmic")
  }
}
