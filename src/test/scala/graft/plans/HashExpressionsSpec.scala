package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** Md5Halves must be bit-identical to the hex-string form it replaced —
  * `conv(substring(md5(x), 1, 14), 16, 10)` / chars 15..28 for the second
  * half — which stays here as the executable spec (it is also exactly what
  * the DuckDB oracles compute). */
class HashExpressionsSpec extends SparkSpec {

  private def hexHalf(c: org.apache.spark.sql.Column, start: Int) =
    conv(substring(md5(c), start, 14), 16, 10).cast("long")

  test("matches the conv(substring(md5)) form on varied inputs") {
    import spark.implicits._
    val texts = Seq("", "a", "alpha beta gamma", "Ünïcødé ⚡ text",
      "0123456789abcdef0123456789abcdef", "x" * 5000, " leading space",
      "salt|42|en")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val got = df.select(col("id"), HashExpressions.md5Halves(col("s")).as("h"))
      .select(col("id"), col("h.b1"), col("h.b2"))
      .as[(Long, Long, Long)].collect()
      .map { case (i, a, b) => i -> (a, b) }.toMap
    val want = df.select(col("id"), hexHalf(col("s"), 1).as("b1"),
        hexHalf(col("s"), 15).as("b2"))
      .as[(Long, Long, Long)].collect()
      .map { case (i, a, b) => i -> (a, b) }.toMap
    assert(got == want)
    // 56-bit range: always non-negative, below 2^56
    got.values.foreach { case (a, b) =>
      assert(a >= 0L && a < (1L << 56) && b >= 0L && b < (1L << 56))
    }
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "s")
    val got = df.select(col("id"),
        HashExpressions.md5Halves(col("s")).getField("b1").as("b1"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L).isDefined && got(2L).isEmpty)
  }

  test("non-string input is an analysis error") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("id", "n")
    val e = intercept[AnalysisException] {
      df.select(HashExpressions.md5Halves(col("n"))).collect()
    }
    assert(e.getMessage.contains("string") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("SQL registration: md5_halves usable from spark.sql") {
    HashExpressions.register(spark)
    val r = spark.sql(
      "SELECT md5_halves('abc').b1 AS b1, md5_halves('abc').b2 AS b2")
      .collect().head
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72
    assert(r.getLong(0) == java.lang.Long.parseLong("900150983cd24f", 16))
    assert(r.getLong(1) == java.lang.Long.parseLong("b0d6963f7d28e1", 16))
  }
}
