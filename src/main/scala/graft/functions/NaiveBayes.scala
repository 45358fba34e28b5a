package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-feature multinomial Naive Bayes — the trainable document
  * classifier every published curation pipeline keeps at its gate (the
  * GPT-3/CCNet "quality classifier", fastText's langid): train on a
  * labeled slice, score the whole corpus, route each doc by the argmax
  * class. The reference app has no learned operator at all (its routing
  * is the fixed status ladder, `HttpPostAction.cs:67-83`); this is the
  * [E] extension surface's learned router.
  *
  * Same scale discipline as [[ImportanceWeights]] (the two share the
  * feature stream):
  *  - features = word unigrams + bigrams hashed into `buckets` cells —
  *    the model is `classes × buckets` counts no matter the vocabulary;
  *  - training = ONE map-side-combined aggregation over the labeled
  *    slice, collected at ≤ classes·buckets rows (bounded state — the
  *    same vectors the streaming maintainer folds);
  *  - scoring = a second narrow scan of the eval slice joined against
  *    the BROADCAST (class, bucket) log-likelihood grid, one
  *    map-side-combined per-(doc, class) sum, then an argmax by pure
  *    aggregation (max score per doc + join-back + min-label tie-break)
  *    — no window, nothing wide shuffles, work ∝ corpus tokens ×
  *    classes.
  *
  * Deterministic: the 56-bit md5 feature hash
  * ([[graft.dedup.Dedup.hexHash]]) and driver-side StrictMath.log (the
  * same function Spark's `log` applies) make the model and every score
  * bit-reproducible — DuckDB rebuilds them for the oracle
  * (`e_nb_classify` / `e_nb_confusion`).
  */
object NaiveBayes {

  /** The trained model: per-class per-bucket feature-instance counts and
    * per-class training doc counts, plus the replay cursor of the
    * streaming fold ([[graft.streaming.StreamingNaiveBayes]] — carried
    * IN the model so counts and cursor persist/commit together). */
  final case class Model(classes: Array[String], counts: Array[Array[Long]],
                         docs: Array[Long], lastBatch: Long = -1L) {
    require(classes.length == counts.length && classes.length == docs.length,
      "model arrays must agree in class count")
    def buckets: Int = if (counts.isEmpty) 0 else counts(0).length
  }

  /** Train on the `isTrain` slice of `docs`: one bounded histogram
    * aggregation (≤ classes·buckets rows) plus a tiny per-class doc
    * count. Class order is sorted — deterministic across runs. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, isTrain: Column, buckets: Int,
            salt: String = "nb|"): Model = {
    require(buckets >= 2, "need at least two hash buckets")
    val feats = ImportanceWeights.featureBuckets(
      docs.filter(isTrain), idCol, textCol,
      Seq("__lab" -> col(labelCol).cast("string")), buckets, salt)
    val docCounts = docs.filter(isTrain)
      .groupBy(col(labelCol).cast("string").as("__lab"))
      .agg(count(lit(1)).as("nd"))
      .collect() // ≤ classes rows
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val classes = docCounts.keys.toArray.sorted
    val idx = classes.zipWithIndex.toMap
    val counts = Array.fill(classes.length)(new Array[Long](buckets))
    feats.groupBy(col("__lab"), col("__b"))
      .agg(count(lit(1)).as("n"))
      .collect() // ≤ classes · buckets rows by construction
      .foreach(r => counts(idx(r.getString(0)))(r.getLong(1).toInt) = r.getLong(2))
    Model(classes, counts, classes.map(docCounts))
  }

  /** The broadcastable (class-index, bucket, log-likelihood, log-prior)
    * grid of a model — add-1 smoothing over buckets, priors from
    * training doc shares. Every (class, bucket) cell is materialized
    * (zero-count cells carry ln(1/(n_c+buckets))), so scoring joins on
    * the bucket alone and fans exactly ×classes. Classes travel as their
    * index into the sorted `m.classes` (the argmax aggregates on it);
    * shared verbatim by the batch and streaming paths — the two cannot
    * diverge. */
  private[graft] def logLikelihoodGrid(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    val totDocs = m.docs.sum.toDouble
    val rows = for {
      c <- m.classes.indices
      nc = m.counts(c).sum.toDouble
      prior = StrictMath.log(m.docs(c) / totDocs)
      b <- 0 until m.buckets
    } yield (c, b.toLong,
      StrictMath.log((m.counts(c)(b) + 1.0) / (nc + m.buckets)), prior)
    rows.toDF("__ci", "__b", "__lp", "__pr")
  }

  /** Score a doc frame under `m`: (doc_id, extra…, pred_<labelCol>,
    * nb_score). The argmax is ONE aggregation — `max(struct(score,
    * -class_idx))` picks the best score and, on ties, the smallest
    * class label (classes are sorted, so the smallest index IS the
    * smallest label; its negation makes `max` prefer it) — no join-back
    * and no second evaluation of the scoring subplan. Scores are
    * rounded to 6 dp before the argmax so the per-(doc, class) double
    * sum lands on the same value in every engine that reproduces it
    * (the DuckDB oracle formulates the identical argmax as max +
    * equality join + min-label, which is result-equal on the rounded
    * scores). `keep` columns are carried through for evaluation joins. */
  def predict(docs: DataFrame, m: Model, idCol: String, textCol: String,
              predCol: String, keep: Seq[String] = Nil,
              salt: String = "nb|"): DataFrame = {
    val scores = classScores(docs, m, idCol, textCol, keep, salt)
      .select(col("doc_id") +: keep.map(col) :+
        struct(col("__score"), (-col("__ci")).as("__nci")).as("__sc"): _*)
    scores.groupBy(col("doc_id") +: keep.map(col): _*)
      .agg(max(col("__sc")).as("__m"))
      .select(col("doc_id") +: keep.map(col) :+
        element_at(typedLit(m.classes.toSeq),
          (-col("__m.__nci")).cast("int") + 1).as(predCol) :+
        col("__m.__score").as("nb_score"): _*)
  }

  /** Per-(doc, class) rounded scores with the class still as its sorted
    * index (`__ci`) — the shared scoring subplan of [[predict]] and
    * [[scoreAll]]. */
  private def classScores(docs: DataFrame, m: Model, idCol: String,
                          textCol: String, keep: Seq[String],
                          salt: String): DataFrame = {
    val feats = ImportanceWeights.featureBuckets(docs, idCol, textCol,
      keep.map(k => k -> col(k)), m.buckets, salt)
    val grid = logLikelihoodGrid(docs.sparkSession, m)
    val scored = feats.join(broadcast(grid), Seq("__b"))
      .groupBy(col("doc_id") +: keep.map(col) :+ col("__ci") :+ col("__pr"): _*)
      .agg(sum(col("__lp")).as("__s"))
      .select(col("doc_id") +: keep.map(col) :+ col("__ci") :+
        round(col("__pr") + col("__s"), 6).as("__score"): _*)
    // TOKEN-FREE docs (empty / punctuation-only text yields zero unicode
    // features, hence zero rows from featureBuckets) score the PRIOR
    // alone — the smoothing contract's "cross-corpus application is
    // total" extends to feature-less rows instead of silently dropping
    // them. Detected IN-ROW (token count 0 ⇔ no unigrams ⇔ no features),
    // so the branch is a narrow filtered scan crossing the
    // classes-bounded priors frame — no doc-grain join enters the plan
    // (PlanAssertionsSpec pins the broadcast-only property).
    val priors = grid.select(col("__ci"), col("__pr")).distinct()
    val priorOnly = docs
      .filter(graft.functions.TextAnalysis.unicodeTokenCount(col(textCol)) === 0)
      .select(col(idCol).cast("long").as("doc_id") +: keep.map(col): _*)
      .crossJoin(broadcast(priors))
      .select(col("doc_id") +: keep.map(col) :+ col("__ci") :+
        round(col("__pr"), 6).as("__score"): _*)
    scored.unionByName(priorOnly)
  }

  /** EVERY class's score per document — (doc_id, keep…, class, score) —
    * the input to one-vs-rest margins, PR-curve calibration, and any
    * consumer that needs more than the argmax. Same plan as [[predict]]
    * minus the final argmax aggregation; output is |docs| × |classes|
    * rows. */
  def scoreAll(docs: DataFrame, m: Model, idCol: String, textCol: String,
               keep: Seq[String] = Nil, salt: String = "nb|"): DataFrame =
    classScores(docs, m, idCol, textCol, keep, salt)
      .select(col("doc_id") +: keep.map(col) :+
        element_at(typedLit(m.classes.toSeq), col("__ci") + 1).as("class") :+
        col("__score").as("score"): _*)

  /** Train-on-the-rest, score-the-held-out convenience — the graded
    * query shape. */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               labelCol: String, isEval: Column, buckets: Int,
               salt: String = "nb|"): DataFrame = {
    val m = train(docs, idCol, textCol, labelCol, !isEval, buckets, salt)
    predict(docs.filter(isEval), m, idCol, textCol,
      predCol = s"pred_$labelCol", keep = Seq(labelCol), salt = salt)
  }
}
