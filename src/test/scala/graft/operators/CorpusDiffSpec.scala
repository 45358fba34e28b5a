package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusDiffSpec extends SparkSpec {

  import spark.implicits._

  private val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
  private val v2 = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d"))
    .toDF("doc_id", "text")

  test("snapshotDiff labels added/removed/modified/unchanged") {
    val got = CorpusDiff.snapshotDiff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "modified", 4L -> "added"))
  }

  test("delta drops unchanged rows only") {
    val got = CorpusDiff.delta(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "modified", 4L -> "added"))
  }

  test("identical snapshots produce an empty delta") {
    assert(CorpusDiff.delta(v1, v1, "doc_id", "text").count() == 0)
  }

  test("null text is presence, not absence: null→null unchanged, null↔text modified") {
    val n1 = Seq((1L, null: String), (2L, "a"), (3L, null: String))
      .toDF("doc_id", "text")
    val n2 = Seq((1L, null: String), (2L, null: String), (3L, "c"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.snapshotDiff(n1, n2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "modified", 3L -> "modified"))
  }
}
