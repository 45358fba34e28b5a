package graft.functions

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("cross-entropy matches the add-1 unigram formula by hand") {
    import spark.implicits._
    // corpus: "a a b" + "b c" → counts a=2 b=2 c=1, N=5, V=3
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    def p(c: Double) = (c + 1.0) / (5.0 + 1.0 * (3.0 + 1.0))
    val h1 = -(math.log(p(2)) * 2 + math.log(p(2))) / 3 // a a b
    val h2 = -(math.log(p(2)) + math.log(p(1))) / 2     // b c
    assert(out(1L)._1 == 3 && out(2L)._1 == 2)
    assert(out(1L)._2 == r6(h1), s"doc 1: ${out(1L)._2} vs ${r6(h1)}")
    assert(out(2L)._2 == r6(h2))
    assert(out(1L)._3 == r6(math.exp(h1)))
    // rarer tokens → higher surprise: the doc containing the hapax 'c'
    // must score a higher cross-entropy than the common-tokens-only doc
    assert(out(2L)._2 > out(1L)._2)
  }

  test("uniform corpus: every doc scores identically, perplexity = 1/p(w)") {
    import spark.implicits._
    // each token appears exactly once → N = 4, V = 4, p = 2/9 for every
    // token; cross-entropy is the same for both docs
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val p = 2.0 / 9.0
    assert(out(1L) == out(2L))
    assert(out(1L)._1 == r6(-math.log(p)))
    assert(out(1L)._2 == r6(1.0 / p))
  }

  test("alpha controls smoothing: alpha -> 0 approaches the MLE estimate") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a b")).toDF("doc_id", "text")
    val smoothed = LanguageModel.perplexity(docs, "doc_id", "text", alpha = 1.0)
      .head().getDouble(2)
    val nearMle = LanguageModel.perplexity(docs, "doc_id", "text", alpha = 1e-9)
      .head().getDouble(2)
    val mle = -(4 * math.log(4.0 / 5) + math.log(1.0 / 5)) / 5
    assert(math.abs(nearMle - mle) < 1e-4)
    assert(smoothed != nearMle)
  }
}
