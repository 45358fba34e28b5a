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

  test("interpolated bigram model matches the hand formula") {
    import spark.implicits._
    // corpus: "a b a" + "a b" → unigram a=3 b=2 (N=5, V=2);
    // bigrams: (a,b)=2, (b,a)=1
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val out = LanguageModel.perplexityInterpolated(docs, "doc_id", "text",
        alpha = 1.0, lambda = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def pu(c: Double) = (c + 1.0) / (5.0 + 1.0 * (2.0 + 1.0))
    def pb(c12: Double, cPrev: Double) =
      (c12 + 1.0) / (cPrev + 1.0 * (2.0 + 1.0))
    def mix(c12: Double, cPrev: Double, cw: Double) =
      0.7 * pb(c12, cPrev) + (1.0 - 0.7) * pu(cw)
    // doc 1: a (init, unigram) | b after a | a after b
    val h1 = -(math.log(pu(3)) + math.log(mix(2, 3, 2)) +
      math.log(mix(1, 2, 3))) / 3
    // doc 2: a (init) | b after a
    val h2 = -(math.log(pu(3)) + math.log(mix(2, 3, 2))) / 2
    assert(out(1L)._1 == 3 && out(2L)._1 == 2)
    assert(out(1L)._2 == r6(h1), s"doc 1: ${out(1L)._2} vs ${r6(h1)}")
    assert(out(2L)._2 == r6(h2), s"doc 2: ${out(2L)._2} vs ${r6(h2)}")
  }

  test("lambda = 0 reduces the interpolated model to the unigram scorer") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c a")).toDF("doc_id", "text")
    val uni = LanguageModel.perplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val interp = LanguageModel.perplexityInterpolated(docs, "doc_id", "text",
        alpha = 1.0, lambda = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni == interp)
  }

  test("bigram context separates docs the unigram model cannot") {
    import spark.implicits._
    // identical unigram bags; doc 1 repeats the corpus-frequent bigram
    // (a b), doc 2 uses the rare orders — the bigram term must score doc 1
    // as less surprising
    val docs = Seq((1L, "a b a b"), (2L, "b a b a"), (3L, "a b a b"))
      .toDF("doc_id", "text")
    val out = LanguageModel.perplexityInterpolated(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < out(2L),
      s"frequent-bigram doc should have lower perplexity: $out")
    assert(out(1L) == out(3L))
  }

  test("Kneser-Ney matches the hand formula (discount + continuation)") {
    import spark.implicits._
    // corpus: "a b a" + "a b" → bigrams (a,b)=2, (b,a)=1
    // contexts: c(a)=2, N1+(a,·)=1; c(b)=1, N1+(b,·)=1
    // continuations: N1+(·,b)=1, N1+(·,a)=1; B=2 bigram types, V=2
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val D = 0.75
    val out = LanguageModel.perplexityKneserNey(docs, "doc_id", "text", D)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def pc(n1bwd: Double) = (n1bwd + 1.0) / (2.0 + 2.0 + 1.0)
    def pkn(c12: Double, cv: Double, n1fwd: Double, n1bwd: Double) =
      math.max(c12 - D, 0.0) / cv + (D * n1fwd / cv) * pc(n1bwd)
    // doc 1: a (init → P_cont(a)) | b after a | a after b
    val h1 = -(math.log(pc(1)) + math.log(pkn(2, 2, 1, 1)) +
      math.log(pkn(1, 1, 1, 1))) / 3
    // doc 2: a (init) | b after a
    val h2 = -(math.log(pc(1)) + math.log(pkn(2, 2, 1, 1))) / 2
    assert(out(1L)._1 == 3 && out(2L)._1 == 2)
    assert(out(1L)._2 == r6(h1), s"doc 1: ${out(1L)._2} vs ${r6(h1)}")
    assert(out(2L)._2 == r6(h2), s"doc 2: ${out(2L)._2} vs ${r6(h2)}")
  }

  test("Kneser-Ney separates collocation-bound words from versatile ones") {
    import spark.implicits._
    // 'z' appears ONLY after 'x' (one context, like the 'Francisco'
    // pathology) but frequently; 'c' appears after many contexts with the
    // same total frequency. After any context v where neither bigram was
    // seen (here: scoring 'q z' vs 'q c' with context count c(q) > 0),
    // the continuation term must prefer the versatile 'c'.
    val docs = Seq(
      (1L, "x z x z x z x z"),
      (2L, "a c b c d c e c"),
      (3L, "q q z"),
      (4L, "q q c")).toDF("doc_id", "text")
    val out = LanguageModel.perplexityKneserNey(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(4L) < out(3L),
      s"many-context word should be less surprising after unseen context: $out")
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
