package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The histogram-cut sampler must equal the windowed definition row-for-row
  * — `TokenBudgetSample.windowed` is the executable spec (fine at test
  * scale where a per-domain window task is harmless). */
class TokenBudgetSampleSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    // deterministic texts of varying token counts across 3 "languages"
    (1 to n).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val text = Seq.fill(1 + (i * 7 % 23))("tok").mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame,
                  budgets: Map[String, Long], nBuckets: Int = 8) = {
    val toksCol = size(split(trim(col("text")), " ")).cast("long")
    val scaled = TokenBudgetSample(df, "doc_id", "lang", toksCol, budgets, nBuckets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val exact = TokenBudgetSample.windowed(df, "doc_id", "lang", toksCol, budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    (scaled, exact)
  }

  test("matches the windowed definition on mid-corpus cuts") {
    val (scaled, exact) = run(docs(200),
      Map("aa" -> 300L, "bb" -> 150L, "cc" -> 700L))
    assert(scaled == exact)
    assert(scaled.nonEmpty && scaled.size < 200, "cut must be partial")
  }

  test("few buckets still exact (every bucket straddles or fills)") {
    val (scaled, exact) = run(docs(150),
      Map("aa" -> 400L, "bb" -> 401L, "cc" -> 10L), nBuckets = 1)
    assert(scaled == exact)
  }

  test("high-cardinality group column: the driver histogram stays |budgets|-bounded") {
    import spark.implicits._
    // the adversarial caller the round-13 audit flagged: grouping on a
    // data-cardinality column (here: one 'lang' PER DOC) with a small
    // budget map. The pre-filter must keep the collect at
    // |budgets| × nBuckets regardless — and the answer must still match
    // the windowed definition (non-budgeted domains drop either way).
    val df = (1 to 500).map { i =>
      val lang = if (i <= 20) "keep" else s"host$i" // 481 distinct domains
      (i.toLong, lang, Seq.fill(1 + i % 5)("tok").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val (scaled, exact) = run(df, Map("keep" -> 30L))
    assert(scaled == exact)
    assert(scaled.nonEmpty && scaled.forall(_._2 == "keep"))
    // the checked ceiling refuses an un-collectable request outright
    intercept[IllegalArgumentException] {
      val budgets = (1 to 100000).map(i => s"l$i" -> 10L).toMap
      TokenBudgetSample(df, "doc_id", "lang",
        size(split(trim(col("text")), " ")).cast("long"), budgets,
        nBuckets = 256)
    }
  }

  test("budget 0 / missing domain drops it; huge budget keeps everything") {
    val (scaled, exact) = run(docs(90),
      Map("aa" -> 0L, "cc" -> 1000000L)) // bb missing
    assert(scaled == exact)
    assert(!scaled.exists(_._2 == "aa") && !scaled.exists(_._2 == "bb"))
    assert(scaled.count(_._2 == "cc") == 30, "cc fully kept under a huge budget")
  }

  test("budget smaller than any single doc keeps nothing for that domain") {
    val (scaled, exact) = run(docs(60), Map("aa" -> 1L, "bb" -> 500L, "cc" -> 500L))
    assert(scaled == exact)
    // every doc has >= 1+? tokens; docs have at least 2 tokens for i%23 != 0
    assert(scaled.count(_._2 == "aa") <= 1)
  }

  test("determinism: same input, same sample, across bucket counts") {
    val b = Map("aa" -> 250L, "bb" -> 250L, "cc" -> 250L)
    val r1 = run(docs(120), b, nBuckets = 2)._1
    val r2 = run(docs(120), b, nBuckets = 64)._1
    assert(r1 == r2, "bucket granularity must not change the sample")
  }

  test("non-power-of-two bucket count rejected") {
    intercept[IllegalArgumentException] {
      run(docs(10), Map("aa" -> 10L), nBuckets = 12)
    }
  }
}
