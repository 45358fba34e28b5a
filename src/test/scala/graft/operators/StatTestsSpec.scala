package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatTestsSpec extends SparkSpec {

  import spark.implicits._

  test("ksTest: identical samples give D=0, shifted samples reject") {
    val same = ((1L to 100L).map(i => (i, i % 10)) ++
      (101L to 200L).map(i => (i, i % 10))).toDF("id", "v")
    val r0 = StatTests.ksTest(same, "v", col("id") <= 100)
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(r0._1 == 100 && r0._2 == 100)
    assert(r0._3 == 0.0 && !r0._5)
    // B shifted by +10: disjoint supports → D = 1, reject
    val shifted = ((1L to 100L).map(i => (i, i % 10)) ++
      (101L to 200L).map(i => (i, 10 + i % 10))).toDF("id", "v")
    val r1 = StatTests.ksTest(shifted, "v", col("id") <= 100)
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(r1._3 == 1.0 && r1._5)
    // critical value formula: 1.3581 * sqrt(200/10000)
    val crit = StatTests.KsAlpha05 * math.sqrt(200.0 / 10000.0)
    assert(math.abs(r1._4 - crit) < 1e-6)
  }

  test("chiSquare: independent grid scores 0; dof counts the grid") {
    // perfectly independent 2x2: each cell 25
    val rows = for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 25 } yield (a, b)
    val r = StatTests.chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(Double, Long, Long)].head()
    assert(r == ((0.0, 1L, 100L)))
    // fully dependent: a==x ⇒ b==p (50/50 on the diagonal) → chi2 = n
    val dep = (Seq.fill(50)(("x", "p")) ++ Seq.fill(50)(("y", "q")))
      .toDF("a", "b")
    val r2 = StatTests.chiSquare(dep, "a", "b")
      .as[(Double, Long, Long)].head()
    assert(r2._1 == 100.0 && r2._2 == 1L)
  }

  test("chiSquare: a null category is a level, not a dropped count") {
    // null vs 'x' perfectly independent of b → chi2 must be 0
    val rows = (Seq.fill(10)((null: String, "p")) ++
      Seq.fill(10)((null: String, "q")) ++
      Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("x", "q")))
      .toDF("a", "b")
    val r = StatTests.chiSquare(rows, "a", "b")
      .as[(Double, Long, Long)].head()
    assert(r == ((0.0, 1L, 40L)), s"null level mishandled: $r")
  }

  test("ksTest: one empty slice yields NULL verdict, not 'not rejected'") {
    val df = (1L to 50L).map(i => (i, i % 5)).toDF("id", "v")
    val r = StatTests.ksTest(df, "v", col("id") < 0) // empty A slice
      .select(col("ks_d").isNull.as("dn"), col("reject").isNull.as("rn"))
      .as[(Boolean, Boolean)].head()
    assert(r == ((true, true)))
  }
}
