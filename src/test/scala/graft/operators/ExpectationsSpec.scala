package graft.operators

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {

  import spark.implicits._
  import Expectations._

  private val df = Seq(
    (1L, "a", Some(5L)),
    (2L, null: String, Some(50L)),
    (2L, "c", None),           // duplicate id + null range col
    (3L, "dd", Some(-1L)))     // out of range, fails regex
    .toDF("id", "s", "v")

  test("each rule counts its violations; null never violates value rules") {
    val got = check(df, Seq(NotNull("s"), InSet("s", Seq("a", "c")),
        InRange("v", 0L, 10L), Matches("s", "^[a-c]$"), Unique(Seq("id"))))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    assert(got(("not_null", "s")) == ((1L, false)))
    assert(got(("in_set", "s")) == ((1L, false)))    // "dd" only; null exempt
    assert(got(("in_range", "v")) == ((2L, false)))  // 50 and -1; None exempt
    assert(got(("matches", "s")) == ((1L, false)))   // "dd"
    assert(got(("unique", "id")) == ((1L, false)))   // one duplicate row
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val got = check(clean, Seq(NotNull("s"), Unique(Seq("id"))))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(got.forall(r => r._3 == 0 && r._5))
    assert(got.forall(_._4 == 2))
  }

  test("an empty rule list is rejected") {
    intercept[IllegalArgumentException] { check(df, Nil) }
  }

  test("two rules on one column coexist (index-keyed internals)") {
    val clean = Seq((1L, "srcA"), (2L, "xx")).toDF("id", "s")
    val got = check(clean, Seq(Matches("s", "^src"), Matches("s", "A$")))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(got.length == 2 && got.forall(_._3 == 1L)) // "xx" fails both
  }

  test("unique exempts null-keyed rows; empty tables verdict pass, not null") {
    val withNull = Seq(Some(1L), Some(2L), None).toDF("id")
    val u = check(withNull, Seq(Unique(Seq("id"))))
      .as[(String, String, Long, Long, Boolean)].head()
    assert(u._3 == 0 && u._5, s"null key counted as duplicate: $u")
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val e = check(empty, Seq(NotNull("s"), Unique(Seq("id"))))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(e.forall(r => r._3 == 0 && r._5), s"empty table must pass: ${e.toSeq}")
  }
}
