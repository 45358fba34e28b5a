package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token and subword counts") {
    import spark.implicits._
    val r = Seq(("the quick brown fox", "a1b2 c-d!")).toDF("t1", "t2")
      .select(
        TextAnalysis.tokenCount(col("t1")).as("ws"),
        TextAnalysis.subwordCount(col("t2")).as("sub"))
      .as[(Long, Long)].head()
    assert(r._1 == 4)
    // a1b2 c-d! -> letters: a,b,c,d (4 runs) digits: 1,2 (2) symbols: -,! (2)
    assert(r._2 == 8)
  }

  test("readability: vowel-run syllables, sentence floor, Flesch formulas") {
    import spark.implicits._
    val r = Seq("the cat sat. why not xyz!")
      .toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("w"),
        TextAnalysis.sentenceCount(col("t")).as("s"),
        TextAnalysis.syllableCount(col("t")).as("y"),
        TextAnalysis.fleschReadingEase(col("t")).as("fre"),
        TextAnalysis.fkGradeLevel(col("t")).as("fk"))
      .as[(Long, Long, Long, Double, Double)].head()
    // tokens: the cat sat. why not xyz!  (6 ws tokens)
    assert(r._1 == 6)
    assert(r._2 == 2) // ". " and "!" runs
    // vowel runs: e,a,a,o  = 4 (why/xyz have y-runs: "y" in why, "y" in xyz)
    // the(e) cat(a) sat.(a) why(y) not(o) xyz!(y) = 6 runs; no vowel-free word
    assert(r._3 == 6)
    val fre = 206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)
    assert(math.abs(r._4 - fre) < 1e-6, s"${r._4} vs $fre")
    val fk = 0.39 * (6.0 / 2) + 11.8 * (6.0 / 6) - 15.59
    assert(math.abs(r._5 - fk) < 1e-6)
    // a vowel-free fragment still counts one syllable and one sentence
    val v = Seq("tsk").toDF("t")
      .select(TextAnalysis.syllableCount(col("t")).as("y"),
        TextAnalysis.sentenceCount(col("t")).as("s"))
      .as[(Long, Long)].head()
    assert(v == ((1L, 1L)))
  }

  test("luhnValid separates real cards from card-shaped runs; redact keeps invalid") {
    import spark.implicits._
    val r = Seq(
      ("4532015112830366", true),   // valid test card
      ("4532015112830367", false),  // last digit off
      ("79927398713", true),        // the classic 11-digit Luhn example
      ("79927398710", false))
      .toDF("d", "expect")
      .select(TextAnalysis.luhnValid(col("d")).as("got"), col("expect"))
      .as[(Boolean, Boolean)].collect()
    assert(r.forall(t => t._1 == t._2), r.toSeq.toString)
    val red = Seq("a 4532015112830366 b 4532015112830367 c")
      .toDF("t").select(TextAnalysis.redactCards(col("t")).as("r"))
      .as[String].head()
    assert(red == "a [CARD] b 4532015112830367 c")
    // a 17-digit order id alone NEVER surrenders its first 16 digits
    // (maximal-run candidates), and adjacent cards both redact
    val edge = Seq("id 45320151128303667 x")
      .toDF("t").select(TextAnalysis.redactCards(col("t")).as("r"))
      .as[String].head()
    assert(edge == "id 45320151128303667 x")
    val adj = Seq("4532015112830366 4532015112830366")
      .toDF("t").select(TextAnalysis.redactCards(col("t")).as("r"))
      .as[String].head()
    assert(adj == "[CARD] [CARD]")
    // documented over-redaction: a VALIDATED card also occurring as an
    // infix of a longer run masks there too (safe direction for PII)
    val infix = Seq("id 45320151128303667 x 4532015112830366")
      .toDF("t").select(TextAnalysis.redactCards(col("t")).as("r"))
      .as[String].head()
    assert(infix == "id [CARD]7 x [CARD]")
  }

  test("scriptCounts/dominantScript: Han, Cyrillic, mixed, and none paths") {
    import spark.implicits._
    val rows = Seq(
      "hello world",          // latin
      "中文文本", // 中文文本 — han
      "привет", // привет — cyrillic
      "abc 中文中文中",   // 3 latin vs 5 han
      "123 !?")               // no scripted chars
      .toDF("t")
    val sel = TextAnalysis.scriptCounts(col("t"))
      .map { case (n, c) => c.as(n.toLowerCase) } :+
      TextAnalysis.dominantScript(col("t")).as("dom")
    val r = rows.select(sel: _*)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(r(0) == ((0L, 0L, 0L, 10L, "latin")))
    assert(r(1) == ((0L, 0L, 4L, 0L, "han")))
    assert(r(2) == ((0L, 6L, 0L, 0L, "cyrillic")))
    assert(r(3) == ((0L, 0L, 5L, 3L, "han")))
    assert(r(4) == ((0L, 0L, 0L, 0L, "none")))
  }

  test("unicodeTokens: punctuation splits, whitespace-glued forms separate") {
    import spark.implicits._
    val r = Seq("Hello, world! it's 42.5%—done")
      .toDF("t")
      .select(TextAnalysis.unicodeTokens(col("t")).as("toks"))
      .as[Seq[String]].head()
    assert(r == Seq("Hello", "world", "it", "s", "42", "5", "done"), s"got $r")
  }

  test("unicodeTokens: NFKC collapses full-width, ligature and superscript variants") {
    import spark.implicits._
    // full-width ＡＢＣ → ABC; ligature ﬁsh → fish; x² → x2; the
    // whitespace tokenizer would keep all four spellings distinct
    val r = Seq("ＡＢＣ ﬁsh x² ABC fish x2")
      .toDF("t")
      .select(TextAnalysis.unicodeTokens(col("t")).as("toks"))
      .as[Seq[String]].head()
    assert(r == Seq("ABC", "fish", "x2", "ABC", "fish", "x2"), s"got $r")
  }

  test("unicodeTokens: CJK runs tokenize without spaces; null stays null") {
    import spark.implicits._
    val r = Seq(Some("世界、今日は abc"), None)
      .toDF("t")
      .select(TextAnalysis.unicodeTokens(col("t")).as("toks"))
      .as[Option[Seq[String]]].collect()
    // 、 (ideographic comma) splits the run; は is a letter and glues
    assert(r(0).get == Seq("世界", "今日は", "abc"),
      s"got ${r(0)}")
    assert(r(1).isEmpty)
  }

  test("unicodeTokens: ASCII fast path agrees with the regex slow path bit-for-bit") {
    import spark.implicits._
    // same logical text with and without a non-ASCII char forces both
    // normalizer branches; token sets must agree on the shared suffix
    val r = Seq("café au lait 123", "cafe au lait 123")
      .toDF("t")
      .select(TextAnalysis.unicodeTokens(col("t")).as("toks"))
      .as[Seq[String]].collect()
    assert(r(0) == Seq("café", "au", "lait", "123"))
    assert(r(1) == Seq("cafe", "au", "lait", "123"))
  }

  test("langId picks the stopword-dominant language, und when none") {
    import spark.implicits._
    val r = Seq(
      ("the cat and the dog of a house", "en"),
      ("el gato y la casa de que en", "es"),
      ("der hund und die katze ist ein", "de"),
      ("xyzzy plugh quux", "und")
    ).toDF("text", "expected")
      .select(TextAnalysis.langId(col("text")).as("got"), col("expected"))
      .as[(String, String)].collect()
    r.foreach { case (got, exp) => assert(got == exp, s"expected $exp got $got") }
  }

  test("quality score is in [0,1] and favors stopword-rich natural text") {
    import spark.implicits._
    val r = Seq(
      ("the quick brown fox and the lazy dog of the town in a field", "nat"),
      ("zzzz qqqq kkkk", "junk")
    ).toDF("text", "kind")
      .select(col("kind"), TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(r.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(r("nat") > r("junk"))
  }

  test("redactPii masks emails, ids, phones; piiCount counts each span once") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org or call 555-123-4567 now"),
      (2L, "id 123-45-6789 on file"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("r"),
        TextAnalysis.piiCount(col("text")).as("n"))
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "mail [EMAIL] or call [PHONE] now", 2L),
      // the SSN-shaped id must win over the overlapping phone pattern
      (2L, "id [ID] on file", 1L),
      (3L, "nothing sensitive here", 0L)))
  }

  test("fingerprint: deterministic, order-sensitive, stable constants") {
    import spark.implicits._
    def fp(text: String): Long =
      Seq((1L, text)).toDF("doc_id", "text")
        .select(col("doc_id"), posexplode(split(trim(col("text")), " ")).as(Seq("pos", "tok")))
        .withColumn("term", TextAnalysis.fpTerm(col("tok"), col("pos")))
        .groupBy("doc_id").agg((sum(col("term")) % TextAnalysis.FpMod).as("f"))
        .select("f").as[Long].head()
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"), "rolling hash must be order-sensitive")
    assert(TextAnalysis.FpPowers.head == 1L)
    assert(TextAnalysis.FpPowers(1) == TextAnalysis.FpBase)
  }

  test("langIdFromToks equals langId on the tokenized text") {
    import spark.implicits._
    val texts = Seq("the quick brown fox of the day", "el que y en la casa",
      "zzz qqq", "", "der und die le la de the a")
    val got = texts.toDF("text").select(
        TextAnalysis.langId(col("text")).as("a"),
        TextAnalysis.langIdFromToks(split(trim(col("text")), " ")).as("b"))
      .as[(String, String)].collect()
    got.foreach { case (a, b) => assert(a == b) }
    // deterministic alphabetical tie-break: de/en/es/fr all tie at 0 -> und;
    // explicit tie between de and en resolves to 'de'
    val tie = Seq("der the").toDF("text")
      .select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(tie == "de")
  }
}
