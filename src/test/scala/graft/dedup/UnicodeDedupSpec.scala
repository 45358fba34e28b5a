package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end proof that the UNICODE shingle base
  * (`Dedup.shingleBasesUnicode`: NFKC + `[\p{L}\p{N}]+` runs) fixes what
  * whitespace tokenization silently breaks on CJK / full-width corpora —
  * the TextAnalysisSpec fixtures flowing through the dedup stack: shingle
  * bases → exact n-gram Jaccard → MinHash signatures → decontamination.
  *
  * The graded queries (`e_dedup_unicode`, `e_decontam_unicode`) run on an
  * ASCII corpus where the two tokenizations agree (which is what makes
  * them DuckDB-oracle-able: the oracle has no NFKC normalizer); THIS spec
  * carries the non-ASCII behavioral contract. */
class UnicodeDedupSpec extends SparkSpec {

  import spark.implicits._

  // Space-free CJK sentences separated by ideographic punctuation (。):
  // the shape real CJK text has. Whitespace splitting sees ONE token per
  // doc (there are no ASCII spaces), so the whole doc collapses to one
  // truncated shingle; the unicode tokenizer splits at the punctuation
  // into per-sentence ideograph runs.
  private val sent = Seq("今日天気晴", "明日雨予報", "猫犬散歩行", "山川海空星", "本読書楽")
  private val docA = sent.mkString("。") + "。"
  private val docB = (sent.take(4) :+ "新聞記事読").mkString("。") + "。" // 4 of 5 shared

  private def uniBases(docs: DataFrame): DataFrame =
    Dedup.shingleBasesUnicode(docs, "doc_id", "text", 3)
  // the pre-round-13 default, reproduced explicitly through the
  // tokenizer-generic base (Dedup.shingleBases now IS the unicode form)
  private def legacyBases(docs: DataFrame): DataFrame =
    Dedup.shingleBasesFromTokens(docs, "doc_id",
      graft.functions.TextAnalysis.tokens(col("text")), 3)

  private def sets(bases: DataFrame): Map[Long, Set[Long]] =
    bases.select($"doc_id", $"b1").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("space-free CJK: unicode base shingles per sentence, legacy collapses to one") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val legacy = sets(legacyBases(docs))
    val uni = sets(uniBases(docs))
    // legacy: one whole-doc truncated shingle each, sharing nothing
    assert(legacy(1L).size == 1 && legacy(2L).size == 1)
    assert((legacy(1L) & legacy(2L)).isEmpty,
      "whitespace shingles cannot see the 4-sentence overlap")
    // unicode: 5 tokens → 3 three-token shingles per doc, 2 shared
    assert(uni(1L).size == 3 && uni(2L).size == 3, (uni(1L).size, uni(2L).size))
    assert((uni(1L) & uni(2L)).nonEmpty,
      "unicode shingles must expose the shared sentences")
  }

  test("exact n-gram Jaccard finds the CJK near-dup only under the unicode base") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    def pairs(bases: DataFrame): Map[(Long, Long), Double] =
      Dedup.ngramJaccardFromShingles(
          bases.select($"doc_id", $"b1".as("sh")), minJaccard = 0.1)
        .select($"doc_a", $"doc_b", $"jaccard")
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs(legacyBases(docs)).isEmpty,
      "legacy tokenization is blind to the near-dup")
    val uni = pairs(uniBases(docs))
    assert(uni.contains((1L, 2L)), s"unicode Jaccard must surface the pair: $uni")
    assert(uni((1L, 2L)) == 0.5, s"2 shared of 4 distinct shingles: $uni") // 2/(3+3-2)
  }

  test("NFKC: full-width and ligature spellings share ALL unicode shingles, no legacy ones") {
    // ＡＢＣ ﬁsh x² vs ABC fish x2 — the TextAnalysisSpec normalization
    // fixture as a dedup input. After NFKC the token streams are equal,
    // so the unicode shingle sets are identical (signature-identical for
    // MinHash); the raw strings differ, so legacy shingles share nothing.
    val docs = Seq(
      (1L, "ＡＢＣ ﬁsh x² market report today"),
      (2L, "ABC fish x2 market report today")).toDF("doc_id", "text")
    val uni = sets(uniBases(docs))
    assert(uni(1L) == uni(2L), "NFKC must collapse the spellings")
    val legacy = sets(legacyBases(docs))
    assert(legacy(1L) != legacy(2L))
    // and the MinHash signatures (the LSH input) agree under unicode
    val sigs = Dedup.minhashSignaturesFromBases(uniBases(docs), k = 12)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) == sigs(2L), "identical shingle sets → identical signatures")
  }

  test("decontamination sees CJK bench overlap only through the unicode base") {
    // bench doc = docA; corpus doc = docB (shares 2 of its 3 shingles)
    val docs = Seq((97L, docA), (1L, docB)).toDF("doc_id", "text")
    def hits(bases: DataFrame): Map[Long, Long] =
      graft.functions.CorpusFilters.decontaminateFromShingles(
          bases.filter($"doc_id" =!= 97L).select($"doc_id", $"b1".as("sh")),
          bases.filter($"doc_id" === 97L).select($"b1".as("sh")).distinct())
        .as[(Long, Long)].collect().toMap
    assert(hits(legacyBases(docs)).isEmpty,
      "whitespace decontamination misses the contamination")
    assert(hits(uniBases(docs)) == Map(1L -> 2L),
      "unicode decontamination must count the 2 shared shingles")
  }
}
