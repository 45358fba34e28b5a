package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {

  private val B = 64

  // the portable 56-bit feature hash, reimplemented independently
  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(("nb|" + s).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def feats(text: String): Seq[Long] = {
    // the engine's unicode token grain (round 13): letter/digit runs, so
    // an empty or punctuation-only doc has ZERO features
    val t = "[\\p{L}\\p{N}]+".r.findAllIn(text).toSeq
    val big = if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSeq else Nil
    (t ++ big).map(f => h56(f) % B)
  }

  /** Independent multinomial-NB reference: add-1 smoothing over buckets,
    * doc-share priors, argmax with min-label tie-break on 6dp-rounded
    * scores — the exact contract of [[NaiveBayes.classify]]. */
  private def reference(docs: Seq[(Long, String, String, Boolean)])
      : Map[Long, (String, Double)] = {
    val train = docs.filterNot(_._4)
    val classes = train.map(_._3).distinct.sorted
    val docCounts = train.groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    val totDocs = train.size.toDouble
    val counts: Map[String, Map[Long, Int]] = classes.map { c =>
      c -> train.filter(_._3 == c).flatMap(d => feats(d._2))
        .groupBy(identity).view.mapValues(_.size).toMap
    }.toMap
    def score(c: String, fs: Seq[Long]): Double = {
      val nc = counts(c).values.sum.toDouble
      // a feature-less doc scores the prior alone (the operator's
      // totality contract for empty/punctuation-only text)
      math.log(docCounts(c) / totDocs) +
        fs.map(b => math.log((counts(c).getOrElse(b, 0) + 1.0) / (nc + B))).sum
    }
    docs.filter(_._4).map { case (id, tx, _, _) =>
      val fs = feats(tx)
      val scored = classes.map(c => c -> r6(score(c, fs)))
      val best = scored.map(_._2).max
      id -> ((scored.filter(_._2 == best).map(_._1).min, best))
    }.toMap
  }

  private val corpus = Seq(
    // train: two clearly separated vocabularies
    (1L, "the quick brown fox jumps over the dog", "en", false),
    (2L, "the lazy dog naps under the tree", "en", false),
    (3L, "a quick brown dog jumps the fence", "en", false),
    (4L, "der schnelle braune fuchs springt hoch", "de", false),
    (5L, "der faule hund schlaeft unter dem baum", "de", false),
    // eval
    (6L, "the quick dog jumps", "en", true),
    (7L, "der braune hund springt", "de", true),
    (8L, "x", "en", true),  // 1 token, unseen: priors decide
    (9L, "", "de", true)    // empty text: ZERO features, prior-only score
  )

  private def run() = {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "lang", "ev")
    NaiveBayes.classify(df, "doc_id", "text", "lang",
        isEval = col("ev"), buckets = B)
      .select("doc_id", "pred_lang", "nb_score")
      .as[(Long, String, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("matches the independent in-JVM reference (argmax and scores)") {
    assert(run() == reference(corpus))
  }

  test("separable vocabularies classify correctly; unseen text falls to the prior-majority class") {
    val got = run()
    assert(got(6L)._1 == "en", got)
    assert(got(7L)._1 == "de", got)
    // doc 8's token is unseen in training: every class scores it by its
    // smoothed-zero likelihood, so the (higher-prior) majority class wins
    assert(got(8L)._1 == "en", got)
  }

  test("every eval doc gets exactly one prediction") {
    assert(run().keySet == corpus.filter(_._4).map(_._1).toSet)
  }

  test("predict under a hand-built model is deterministic across invocations") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "lang", "ev")
    val m = NaiveBayes.train(df, "doc_id", "text", "lang",
      isTrain = !col("ev"), buckets = B)
    assert(m.classes.toSeq == Seq("de", "en"))
    assert(m.docs.toSeq == Seq(2L, 3L))
    val a = NaiveBayes.predict(df.filter(col("ev")), m, "doc_id", "text", "pred_lang")
      .collect().map(_.toSeq).toSet
    val b = NaiveBayes.predict(df.filter(col("ev")), m, "doc_id", "text", "pred_lang")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("scoreAll: one row per (doc, class); argmax agrees with predict") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "lang", "ev")
    val m = NaiveBayes.train(df, "doc_id", "text", "lang",
      isTrain = !col("ev"), buckets = B)
    val all = NaiveBayes.scoreAll(df.filter(col("ev")), m, "doc_id", "text")
      .as[(Long, String, Double)].collect()
    val ids = corpus.filter(_._4).map(_._1).toSet
    assert(all.map(_._1).toSet == ids)
    assert(all.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq("de", "en")))
    // argmax with min-label tie-break reproduces predict exactly
    val viaAll = all.groupBy(_._1).map { case (id, rows) =>
      val best = rows.map(_._3).max
      id -> rows.filter(_._3 == best).map(_._2).min
    }
    val viaPredict = NaiveBayes
      .predict(df.filter(col("ev")), m, "doc_id", "text", "p")
      .select("doc_id", "p").as[(Long, String)].collect().toMap
    assert(viaAll == viaPredict)
  }
}
