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
}
