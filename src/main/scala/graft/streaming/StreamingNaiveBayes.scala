package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.functions.{ImportanceWeights, NaiveBayes}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Naive-Bayes maintenance — the running form of
  * [[graft.functions.NaiveBayes]]: as labeled docs stream in (a human
  * labeling queue, a feed of moderated samples), fold their per-class
  * hashed-feature histograms into the running model so the corpus
  * router TRACKS the labeled stream instead of fossilizing at its
  * training snapshot.
  *
  * State is `classes × buckets` longs plus one doc counter per class —
  * fixed for the stream's lifetime once the label set has appeared
  * (a batch carrying a never-seen class grows the model by one row;
  * class order stays sorted, so the model is independent of arrival
  * order). Each micro-batch contributes one bounded map-side-combined
  * histogram collect; the fold is associative and order-independent,
  * so the streamed model equals the batch model of the union at every
  * fold point.
  *
  * Classification is ON DEMAND (the [[StreamingImportanceWeights]]
  * discipline): [[Handle.predict]] scores a frame under the CURRENT
  * model through the same broadcast log-likelihood grid the batch path
  * builds — the two cannot diverge.
  *
  * Replay/resume: foreachBatch is at-least-once and the fold is not
  * idempotent, so redeliveries are dropped on the last-folded batch id
  * carried IN the model ([[NaiveBayes.Model.lastBatch]]) — counts and
  * cursor persist/commit atomically through the one `ref.set`. To
  * resume after a stop, persist [[Handle.currentModel]] and pass it
  * back as `init`. */
object StreamingNaiveBayes {

  final class Handle private[StreamingNaiveBayes] (
      ref: AtomicReference[NaiveBayes.Model], salt: String) {

    def currentModel: NaiveBayes.Model = ref.get()

    /** Score `docs` under the CURRENT model — identical output contract
      * to [[NaiveBayes.predict]]. */
    def predict(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", predCol: String = "pred_label",
                keep: Seq[String] = Nil): DataFrame =
      NaiveBayes.predict(docs, ref.get(), idCol, textCol, predCol, keep, salt)
  }

  /** Start maintaining the model over a streaming labeled-doc frame.
    * Pass a previously persisted model as `init` to resume. */
  def start(docs: DataFrame, checkpointLocation: String, buckets: Int,
            init: Option[NaiveBayes.Model] = None,
            idCol: String = "doc_id", textCol: String = "text",
            labelCol: String = "label", salt: String = "nb|")
      : (StreamingQuery, Handle) = {
    require(buckets >= 2, "need at least two hash buckets")
    init.foreach(m => require(m.classes.isEmpty || m.buckets == buckets,
      s"init model has ${m.buckets} buckets, expected $buckets"))
    val ref = new AtomicReference[NaiveBayes.Model](init.getOrElse(
      NaiveBayes.Model(Array.empty, Array.empty, Array.empty)))
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > ref.get().lastBatch) {
          ref.set(foldBatch(ref.get(), batch, idCol, textCol, labelCol,
            buckets, salt).copy(lastBatch = batchId))
        }
      }
      .start()
    (query, new Handle(ref, salt))
  }

  /** One micro-batch fold: the batch's bounded (class, bucket) histogram
    * and per-class doc counts merged into the running model. A class
    * first seen in this batch extends the model by one (zeroed) row;
    * class order is re-sorted so the result is arrival-order
    * independent. Leaves `lastBatch` untouched — the foreachBatch
    * closure stamps it as the commit step. */
  private[streaming] def foldBatch(m: NaiveBayes.Model, batch: DataFrame,
      idCol: String, textCol: String, labelCol: String, buckets: Int,
      salt: String): NaiveBayes.Model = {
    val feats = ImportanceWeights.featureBuckets(batch, idCol, textCol,
      Seq("__lab" -> col(labelCol).cast("string")), buckets, salt)
    val hist = feats.groupBy(col("__lab"), col("__b"))
      .agg(count(lit(1)).as("n"))
      .collect() // ≤ batch classes · buckets rows
      .map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2)))
    val batchDocs = batch
      .groupBy(col(labelCol).cast("string").as("__lab"))
      .agg(count(lit(1)).as("nd"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classes = (m.classes ++ batchDocs.keys).distinct.sorted
    val idx = classes.zipWithIndex.toMap
    val counts = Array.fill(classes.length)(new Array[Long](buckets))
    val docs = new Array[Long](classes.length)
    m.classes.indices.foreach { i =>
      val j = idx(m.classes(i))
      System.arraycopy(m.counts(i), 0, counts(j), 0, buckets)
      docs(j) = m.docs(i)
    }
    hist.foreach { case (c, b, n) => counts(idx(c))(b) += n }
    batchDocs.foreach { case (c, n) => docs(idx(c)) += n }
    NaiveBayes.Model(classes, counts, docs, m.lastBatch)
  }
}
