package graft.operators

import graft.SparkSpec

/** TableProfile invariants on a hand-checked frame with nulls. */
class TableProfileSpec extends SparkSpec {

  test("profiles a frame with nulls column by column") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("aa")),
      (Some(2L), None),
      (None, Some("bbbb")),
      (Some(2L), Some("aa"))
    ).toDF("id", "s")
    val rows = TableProfile(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(rows.keySet == Set("id", "s"))
    assert(rows("id") == ((4L, 1L, 2L, Some(1.0))))           // "1","2","2" → avg len 1
    assert(rows("s") == ((4L, 1L, 2L, Some(2.666667))))       // 8/3 rounded to 6dp
  }

  test("hostile column names (quotes, backticks, dots) profile fine") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("it's `quoted`", "dotted.name")
    val rows = TableProfile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("it's `quoted`", "dotted.name"))
    assert(rows("it's `quoted`").getLong(3) == 2L)   // n_distinct
    assert(rows("dotted.name").getLong(2) == 0L)     // n_null
  }

  test("all-null column: distinct 0, avg_len null") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "s")
    val rows = TableProfile(df).collect().map(r => r.getString(0) -> r).toMap
    val s = rows("s")
    assert(s.getLong(2) == 2L && s.getLong(3) == 0L && s.isNullAt(4))
  }
}
