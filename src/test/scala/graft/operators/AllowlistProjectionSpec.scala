package graft.operators

import graft.SparkSpec

class AllowlistProjectionSpec extends SparkSpec {
  import AllowlistProjection._

  test("parseAllowlist splits, trims, drops empties") {
    assert(parseAllowlist("Id, Name ,,LastUpdate, ") == Seq("Id", "Name", "LastUpdate"))
    assert(parseAllowlist("") == Seq.empty)
    assert(parseAllowlist(null) == Seq.empty)
  }

  test("normalizeTableName strips brackets") {
    assert(normalizeTableName("[dbo].[TrackingDemo]") == "dbo.TrackingDemo")
    assert(normalizeTableName("plain") == "plain")
  }

  test("unionAllowlists: case-insensitive union, blank guard") {
    assert(unionAllowlists(Some("Id,Name"), Some("NAME,LastUpdate"))
      == Some(Seq("Id", "Name", "LastUpdate")))
    assert(unionAllowlists(None, None).isEmpty)
    assert(unionAllowlists(Some("   "), None).isEmpty)
    assert(unionAllowlists(Some("   "), Some("Id")) == Some(Seq("Id")))
  }

  test("project: case-insensitive select; unknown cols ignored; None passes through") {
    import spark.implicits._
    val df = Seq((1, "a", 2.0)).toDF("Id", "Name", "Score")
    assert(project(df, Some(Seq("ID", "score", "ghost"))).columns.toSeq == Seq("Id", "Score"))
    assert(project(df, None).columns.toSeq == Seq("Id", "Name", "Score"))
    // empty allowlist (present but nothing matches) drops all columns
    assert(project(df, Some(Seq("ghost"))).columns.isEmpty)
  }
}
