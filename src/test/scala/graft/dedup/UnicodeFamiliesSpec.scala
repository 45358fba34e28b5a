package graft.dedup

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CJK-divergence contract for the round-13 unicode-tokenizer migration:
  * every family the round-12 verdict flagged as whitespace-split (SimHash,
  * passage dedup, exact-span dedup, winnowing, suffix array, BM25, the LM
  * token streams, the BPE word table) now DEFAULTS to
  * [[TextAnalysis.unicodeTokens]], and this spec proves per family what
  * the flip buys on space-free CJK text — the exact failure mode
  * [[UnicodeDedupSpec]] proves for the MinHash family.
  *
  * Shape of every test: the same corpus through (a) the unicode default
  * and (b) the legacy whitespace grain (passed explicitly via the `tok`
  * parameter); the legacy side is blind — one whole-doc token — while the
  * unicode side sees the structure. The graded oracles run on the ASCII
  * corpus where the two grains agree; THIS spec carries the non-ASCII
  * behavioral contract. */
class UnicodeFamiliesSpec extends SparkSpec {

  import spark.implicits._

  private val legacyTok = TextAnalysis.tokens _

  // Space-free CJK sentences joined by ideographic punctuation — real CJK
  // text shape: zero ASCII spaces, so the whitespace grain sees ONE token
  // per document.
  private val sent = Seq("今日天気晴", "明日雨予報", "猫犬散歩行", "山川海空星", "本読書楽")
  private val docA = sent.mkString("。") + "。"
  // docB shares sentences 2..5 but leads differently (the shared run is
  // INTERIOR, so even character-prefix comparisons on the raw strings
  // see nothing)
  private val docB = ("新聞記事読" +: sent.drop(1)).mkString("。") + "。"

  private def docs: DataFrame =
    Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")

  test("simhash: unicode fingerprints expose the shared sentences, legacy is one-token noise") {
    def ham(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long = {
      val fp = Dedup.fingerprints(docs, "doc_id", "text", bits = 16, tok = tok)
        .select($"doc_id", $"sh_long").as[(Long, Long)].collect().toMap
      java.lang.Long.bitCount(fp(1L) ^ fp(2L)).toLong
    }
    val hUni = ham(TextAnalysis.unicodeTokens)
    val hLeg = ham(legacyTok)
    // unicode: 4 of 5 token votes agree per bit, so every bit where the
    // shared tokens outvote the one differing token matches — the pair is
    // a near-dup candidate. legacy: each fingerprint IS the bit pattern
    // of one unrelated whole-doc hash — independent coin flips.
    assert(hUni <= 3, s"unicode hamming must be near-dup grade, got $hUni")
    assert(hLeg > hUni,
      s"legacy whole-doc-token fingerprints cannot be closer: leg=$hLeg uni=$hUni")
  }

  test("passage dedup: unicode finds the repeated passage, legacy dedups nothing") {
    def dropped(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long =
      Dedup.passageDedup(docs, "doc_id", "text", passageTokens = 2, tok = tok)
        .agg(sum($"n_dropped")).as[Long].head()
    // unicode, w=2: docA passages [s1 s2][s3 s4][s5], docB [new s2][s3 s4][s5]
    // → [s3 s4] and [s5] recur and drop from doc 2
    assert(dropped(TextAnalysis.unicodeTokens) == 2L)
    // legacy: ONE passage per doc (the whole string), all distinct
    assert(dropped(legacyTok) == 0L)
  }

  test("exact-span dedup: unicode cuts the copied run, legacy sees no grams") {
    def removed(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Map[Long, Long] =
      Dedup.exactSpanDedup(docs, "doc_id", "text", spanWords = 3, tok = tok)
        .select($"doc_id", $"n_removed").as[(Long, Long)].collect().toMap
    val uni = removed(TextAnalysis.unicodeTokens)
    // docB's trailing 4 shared tokens carry grams (s2 s3 s4) and
    // (s3 s4 s5), both first seen in docA → tokens 2..5 of docB cut
    assert(uni(1L) == 0L && uni(2L) == 4L, uni)
    val leg = removed(legacyTok)
    // legacy: single-token docs are shorter than any 3-gram → untouched
    assert(leg(1L) == 0L && leg(2L) == 0L, leg)
  }

  test("winnowing: the guarantee only holds on unicode tokens") {
    def matches(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long =
      Winnowing.matchesFromFingerprints(
        Winnowing.fingerprints(docs, "doc_id", "text",
          shingleWidth = 2, window = 2, tok = tok), minShared = 1).count()
    // 4 shared tokens ≥ window + shingleWidth − 1 = 3 → at least one
    // identical fingerprint is guaranteed
    assert(matches(TextAnalysis.unicodeTokens) >= 1L)
    assert(matches(legacyTok) == 0L,
      "one-token docs share no whole-doc fingerprint")
  }

  test("suffix array: cross-doc repeated span surfaces only at the unicode grain") {
    def topLcp(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): (Long, String) =
      graft.operators.SuffixArray.repeatedSpansFromRanks(
          graft.operators.SuffixArray.suffixRanks(docs, "doc_id", "text", tok = tok),
          docs, "doc_id", "text", window = 4, topK = 1,
          tok = tok) // same grain through rank build AND span read
        .select($"lcp", $"prefix").as[(Long, String)].head()
    val (lcpU, pfx) = topLcp(TextAnalysis.unicodeTokens)
    // the shared interior run 明日雨予報 猫犬散歩行 山川海空星 本読書楽 is the
    // longest cross-doc repeat (5+5+5+4 chars + 3 joiners = 22 chars)
    assert(lcpU == 22L && pfx == sent.drop(1).mkString(" "), (lcpU, pfx))
    val (lcpL, _) = topLcp(legacyTok)
    // legacy: one suffix per doc, and the docs differ from char 1 → LCP 0
    assert(lcpL == 0L, s"legacy grain must see nothing, got $lcpL")
  }

  test("bm25: a sentence-grain query term only matches under unicode tokens") {
    def hits(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Long] =
      graft.functions.Bm25.topDocs(docs, "doc_id", "text",
          queryTerms = Seq("明日雨予報"), tok = tok)
        .select($"doc_id").as[Long].collect().toSeq
    assert(hits(TextAnalysis.unicodeTokens).sorted == Seq(1L, 2L))
    assert(hits(legacyTok).isEmpty,
      "whitespace postings never contain the sentence token")
  }

  test("language model: unicode vocabulary is sentence-grain, legacy is one type per doc") {
    def vocab(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Long =
      graft.functions.LanguageModel.unigramCounts(docs, "text", tok).count()
    assert(vocab(TextAnalysis.unicodeTokens) == 6L) // 5 shared + 1 new sentence
    assert(vocab(legacyTok) == 2L) // the two whole-doc strings
    // and the scorer covers every token at the unicode grain
    val scored = graft.functions.LanguageModel.perplexity(docs, "doc_id", "text")
      .select($"doc_id", $"n_scored").as[(Long, Long)].collect().toMap
    assert(scored == Map(1L -> 5L, 2L -> 5L), scored)
  }

  test("bpe: the ascii word table is EMPTY on CJK, the unicode table trains") {
    val wcAscii = graft.functions.BpeVocab.wordCounts(docs, "text")
    assert(wcAscii.count() == 0L, "`[a-z]+` drops every CJK word")
    val wcUni = graft.functions.BpeVocab.wordCountsUnicode(docs, "text")
    assert(wcUni.count() == 6L)
    val merges = graft.functions.BpeVocab.train(wcUni, nMerges = 3)
    assert(merges.length == 3 && merges.forall(_.pair_count > 0),
      s"training on the unicode word table must learn real merges: $merges")
  }
}
