package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming two-sample drift test — the standing form of
  * [[graft.operators.StatTests.ksTest]]: maintain one exact value-count
  * histogram per slice as streaming aggregation state (domain-bounded,
  * independent of stream length — the [[StreamingWindowPercentiles]]
  * state discipline), and read the KS verdict off the finished
  * histograms at any trigger. The monitor a live ingest keeps against a
  * reference slice: "has this feed's length/score distribution drifted
  * since the baseline, significantly?"
  *
  * Replay/exactly-once: a plain streaming aggregation — checkpoint
  * recovery replays micro-batches into the same state version; no
  * batch-id cursor needed. */
object StreamingDrift {

  /** Running per-slice histograms over a streaming frame with
    * (is_a: boolean, v: long). One row per slice per trigger. */
  def sliceHistograms(rows: DataFrame): DataFrame =
    rows.groupBy(col("is_a"))
      .agg(udaf(new StreamingWindowPercentiles.HistAgg).apply(col("v"))
        .as("hist"), count(lit(1)).as("n"))

  /** KS verdict from two finished histograms — the sup of the CDF step
    * difference evaluated at every distinct value of either sample,
    * identical convention to the batch operator. Returns
    * (ks_d, ks_crit, reject); requires both slices non-empty. */
  def ks(a: Map[Long, Long], b: Map[Long, Long],
         alphaCoeff: Double = graft.operators.StatTests.KsAlpha05)
      : (Double, Double, Boolean) = {
    require(a.nonEmpty && b.nonEmpty, "both slices need data for a verdict")
    val na = a.values.sum.toDouble
    val nb = b.values.sum.toDouble
    val values = (a.keySet ++ b.keySet).toSeq.sorted
    var (ca, cb, d) = (0L, 0L, 0.0)
    values.foreach { v =>
      ca += a.getOrElse(v, 0L); cb += b.getOrElse(v, 0L)
      d = math.max(d, math.abs(ca / na - cb / nb))
    }
    val crit = alphaCoeff * math.sqrt((na + nb) / (na * nb))
    (d, crit, d > crit)
  }
}
