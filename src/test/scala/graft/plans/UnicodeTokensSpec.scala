package graft.plans

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** Parity contract of the fused native [[UnicodeTokens]] expression
  * against the regex chain it replaced
  * (`regexp_extract_all(nfkc_normalize(text), '[\p{L}\p{N}]+')`):
  * bit-identical token arrays on every input shape — ASCII fast path,
  * punctuation boundaries, CJK, full-width/ligature NFKC rewrites,
  * supplementary-plane code points, token-free and empty strings. */
class UnicodeTokensSpec extends SparkSpec {

  import spark.implicits._

  private def both(texts: Seq[String]): Seq[(String, Seq[String], Seq[String])] =
    texts.toDF("text")
      .select(col("text"),
        TextAnalysis.unicodeTokens(col("text")).as("native"),
        TextAnalysis.unicodeTokensRegex(col("text")).as("regex"))
      .as[(String, Seq[String], Seq[String])].collect().toSeq

  test("native == regex chain on every fixture shape") {
    val fixtures = Seq(
      "plain ascii words here",
      "punct,glued!tokens?and--dashes_under",
      "numbers 42 mix3d alpha9numeric 007",
      "  leading  double   spaces\ttabs\nnewlines  ",
      "今日天気晴。明日雨予報。",                    // space-free CJK + ideographic punct
      "ＡＢＣ ﬁsh x² market",                       // NFKC: full-width, ligature, superscript
      "mixed 英語 and 日本語 words",
      "émigré naïve Ångström",                      // combining-free latin diacritics
      "Ⅷ Ⅻ ⅔",                                      // Nl letter numbers + No fraction
      "𝐀𝐁 math 𐐀", // supplementary-plane letters
      "𝟘𝟙𝟚 styled digits",                          // supplementary Nd after NFKC
      "!!! ??? ...",                                // token-free
      "",                                           // empty
      "a",                                          // single char
      "ō")
    both(fixtures).foreach { case (t, native, regex) =>
      assert(native == regex, s"parity break on <$t>: $native vs $regex")
    }
  }

  test("native == regex chain on randomized unicode strings") {
    val rng = new scala.util.Random(13)
    // char pool spanning the interesting classes: ascii alnum, punct,
    // space, CJK, full-width forms, combining marks, digits of other
    // scripts, symbols
    val pool = ("abz09AZ .,!-_" + "今日天気晴雨予報猫犬" + "ＡＢｃｄ１２" +
      "éñüṓ²½Ⅳ٠০" + "€†‡").toCharArray
    val texts = (1 to 200).map { _ =>
      val len = rng.nextInt(40)
      new String(Array.fill(len)(pool(rng.nextInt(pool.length))))
    }
    both(texts).foreach { case (t, native, regex) =>
      assert(native == regex, s"parity break on <$t>: $native vs $regex")
    }
  }

  test("null in, null out; SQL registration works") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(TextAnalysis.unicodeTokens(col("text")).as("t"))
      .collect()
    assert(r.head.isNullAt(0))
    TextExpressions.register(spark)
    val viaSql = spark.sql("SELECT unicode_tokens('a,b 猫犬') AS t")
      .as[Seq[String]].head()
    assert(viaSql == Seq("a", "b", "猫犬"))
  }
}
