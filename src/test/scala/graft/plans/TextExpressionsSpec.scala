package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** WordShingles must be bit-identical to the HOF form it replaced —
  * `transform(sequence(1, greatest(size(t)-(w-1), 1)),
  *            i => array_join(slice(t, i, w), " "))`
  * — which stays here as the executable spec. */
class TextExpressionsSpec extends SparkSpec {

  private def hofShingles(toks: org.apache.spark.sql.Column, w: Int) =
    transform(
      sequence(lit(1), greatest(size(toks) - (w - 1), lit(1))),
      i => array_join(slice(toks, i, lit(w)), " "))

  test("matches the HOF form on mixed lengths, widths 1..4") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon", "one two three", "solo", "",
      "a b", "x y z w v u t s r q", "dup dup dup dup")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    (1 to 4).foreach { w =>
      val toks = split(trim(col("text")), " ")
      val got = df.select(col("id"), TextExpressions.wordShingles(toks, w).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val want = df.select(col("id"), hofShingles(toks, w).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      assert(got == want, s"w=$w")
    }
  }

  test("null token array yields null; empty array yields one empty shingle") {
    import spark.implicits._
    val df = Seq((1L, Some("a b c")), (2L, None)).toDF("id", "text")
    val toks = when(col("text").isNotNull, split(col("text"), " "))
    val got = df.select(col("id"), TextExpressions.wordShingles(toks, 3).as("sh"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(got(1L).contains(Seq("a b c")))
    assert(got(2L).isEmpty)
    val empty = spark.sql("SELECT array()").select(
      TextExpressions.wordShingles(col("array()").cast("array<string>"), 3))
      .collect().head.getSeq[String](0)
    assert(empty == Seq(""))
  }

  test("non-string array input is an analysis error, not silent garbage") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2, 3))).toDF("id", "nums")
    val e = intercept[AnalysisException] {
      df.select(TextExpressions.wordShingles(col("nums"), 2)).collect()
    }
    assert(e.getMessage.contains("array<string>") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("SQL registration: word_shingles usable from spark.sql") {
    TextExpressions.register(spark)
    val rows = spark.sql(
      "SELECT word_shingles(split('a b c d', ' '), 2) AS sh")
      .collect().head.getSeq[String](0)
    assert(rows == Seq("a b", "b c", "c d"))
  }

  test("stays inside whole-stage codegen (no HOF fallback in the plan)") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val plan = df.select(explode(
        TextExpressions.wordShingles(split(col("text"), " "), 3)))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen span
    val shingleLine = plan.linesIterator.find(_.contains("word_shingles")).get
    assert(shingleLine.trim.startsWith("*("),
      s"word_shingles operator must sit inside a codegen span:\n$plan")
    assert(!plan.contains("transform("), s"HOF must be gone:\n$plan")
  }
}
