package graft.plans

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -0.5f, 0.0f), Array(2.0f, 2.0f, 9.0f))
    ).toDF("id", "a", "b")
  }

  test("vec_dot: correct values via the Column API") {
    import spark.implicits._
    val r = vecs.select(col("id"), VectorExpressions.vecDot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) == 32.0)
    assert(r(2L) == 0.0)
  }

  test("vec_dot: bit-identical to the interpreted HOF fold") {
    import spark.implicits._
    val r = vecs.select(
        VectorExpressions.vecDot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    r.foreach { case (n, h) => assert(n == h) }
  }

  test("vec_dot: null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val row = df.select(VectorExpressions.vecDot(col("a"), col("b"))).head()
    assert(row.isNullAt(0))
  }

  test("vec_dot: null ELEMENT yields null, not a silently-zeroed sum") {
    import spark.implicits._
    val df = Seq(
        (1L, Array(Option(1.0), Option.empty[Double]), Array(Option(2.0), Option(3.0))),
        (2L, Array(Option(1.0), Option(2.0)), Array(Option(2.0), Option(3.0))))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"), VectorExpressions.vecDot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1), "null element must propagate to a null result")
    assert(rows(1).getDouble(1) == 8.0)
  }

  test("vec_dot registers for SQL via FunctionRegistry and GraftExtensions path") {
    VectorExpressions.register(spark)
    import spark.implicits._
    vecs.createOrReplaceTempView("v")
    val r = spark.sql("SELECT vec_dot(a, b) AS d FROM v WHERE id = 1")
      .as[Double].head()
    assert(r == 32.0)
  }

  test("vec_dot: array<double> dispatches to double getters (correct values)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(VectorExpressions.vecDot(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(r == 32.0)
  }

  test("vec_dot: mismatched element types raise at analysis, not garbage at runtime") {
    import spark.implicits._
    val ints = Seq((Array(1, 2, 3), Array(4, 5, 6))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(VectorExpressions.vecDot(col("a"), col("b"))).head()
    }
    val mixed = Seq((Array(1.0f), Array(1.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      mixed.select(VectorExpressions.vecDot(col("a"), col("b"))).head()
    }
  }

  test("vec_dot: length mismatch raises instead of silently truncating") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.vecDot(col("a"), col("b"))).head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")))
  }

  test("whole-stage codegen handles the expression (no fallback errors at scale)") {
    import spark.implicits._
    // run through a real aggregation to force codegen paths
    val total = vecs.select(sum(VectorExpressions.vecDot(col("a"), col("a"))).as("s"))
      .as[Double].head()
    assert(total == (1 + 4 + 9) + (0.25 + 0.25 + 0.0))
  }
}
