package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceWeightsSpec extends SparkSpec {

  private val B = 64

  // the portable 56-bit feature hash, reimplemented independently
  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(("dsir|" + s).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // unigrams + bigrams at the engine's unicode token grain (round 13):
  // letter/digit runs — an empty or punctuation-only doc has ZERO
  // features and therefore no weight row (no importance evidence)
  private def feats(text: String): Seq[Long] = {
    val t = "[\\p{L}\\p{N}]+".r.findAllIn(text).toSeq
    val big = if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSeq else Nil
    (t ++ big).map(f => h56(f) % B)
  }

  private def reference(docs: Seq[(Long, String, Boolean)])
      : Map[Long, (Long, Double)] = {
    val all = docs.flatMap { case (id, tx, tg) => feats(tx).map(b => (b, tg)) }
    val nAll = all.size.toDouble
    val nT = all.count(_._2).toDouble
    val histAll = all.groupBy(_._1).view.mapValues(_.size).toMap
    val histT = all.filter(_._2).groupBy(_._1).view.mapValues(_.size).toMap
    def lr(b: Long) = math.log(
      ((histT.getOrElse(b, 0) + 1.0) / (nT + B)) /
        ((histAll(b) + 1.0) / (nAll + B)))
    docs.flatMap { case (id, tx, _) =>
      val fs = feats(tx)
      if (fs.isEmpty) None // token-free docs carry no weight row
      else Some(id -> ((fs.size.toLong, r6(fs.map(lr).sum))))
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps", true),
    (2L, "the quick brown dog naps", true),
    (3L, "der schnelle braune fuchs springt", false),
    (4L, "le renard brun rapide saute", false),
    (5L, "the lazy dog naps", false), // English vocab, NOT in target
    (6L, "x", false),                 // 1 token: no bigram
    (7L, "", false)                   // empty text: zero features, no row
  )

  private def run() = {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "tgt")
    ImportanceWeights.dsirLogRatios(df, "doc_id", "text",
        isTarget = col("tgt"), buckets = B)
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("matches the independent in-JVM reference (counts and log-ratios)") {
    assert(run() == reference(corpus))
  }

  test("docs sharing the target's n-gram distribution outscore the rest") {
    val got = run()
    // doc 5 shares the English target vocabulary and must outscore the
    // non-English docs, even though it is not itself in the target set
    assert(got(5L)._2 > got(3L)._2 && got(5L)._2 > got(4L)._2, got)
    val tgtAvg = (got(1L)._2 + got(2L)._2) / 2
    val offAvg = (got(3L)._2 + got(4L)._2) / 2
    assert(tgtAvg > offAvg, s"target avg $tgtAvg vs off-target $offAvg")
  }
}
