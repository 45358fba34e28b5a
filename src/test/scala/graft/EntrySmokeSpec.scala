package graft

class EntrySmokeSpec extends SparkSpec {
  test("entry: flagship pipeline returns payload rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("payload"))
    val n = df.count()
    assert(n > 0, s"expected >0 change payloads, got $n")
    val sample = df.head().getString(0)
    assert(sample.contains("\"Operation\"") && sample.contains("\"Item\""))
  }

  test("driver contract: every declared query has a DuckDB oracle, no orphans") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"rows-only queries (ALL-oracled invariant broken): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"oracles without queries: ${(o -- q).toSeq.sorted}")
    // names are the cross-file namespace — a duplicate would silently
    // shadow one implementation in the merged map
    val perFile = Seq(
      graft.queries.CoreQueries.queries, graft.queries.RelQueries.queries,
      graft.queries.ScalarQueries.queries, graft.queries.StreamQueries.queries,
      graft.queries.ExtQueries.queries, graft.queries.SeqQueries.queries,
      graft.queries.SqlQueries.queries)
    val total = perFile.map(_.size).sum
    assert(total == q.size,
      s"duplicate query names across files: declared $total, merged ${q.size}")
  }
}
