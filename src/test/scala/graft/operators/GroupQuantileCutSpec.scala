package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupQuantileCutSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(n: Int, nGroups: Int) =
    (0L until n.toLong).map { i =>
      // deterministic pseudo-scores in [0,1] with repeated values (ties)
      (i, s"g${i % nGroups}", ((i * 37) % 101) / 100.0)
    }.toDF("doc_id", "grp", "q")

  private def naive(df: org.apache.spark.sql.DataFrame, frac: Double) =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy($"grp").orderBy($"q".desc, $"doc_id")))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy($"grp")))
      .filter($"__rn" <= floor(lit(frac) * $"__n"))
      .select($"doc_id").as[Long].collect().toSet

  test("equals the per-group global window for assorted fractions") {
    val df = corpus(400, 3)
    for (frac <- Seq(0.0, 0.1, 0.3, 0.5, 0.97, 1.0)) {
      val got = GroupQuantileCut(df, "doc_id", "grp", $"q", frac, nBins = 16)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == naive(df, frac), s"frac=$frac")
    }
  }

  test("ties at the cut break deterministically on id inside the bin") {
    // every row the same score: the cut is decided purely by doc_id
    val df = (0L until 10L).map(i => (i, "g", 0.5)).toDF("doc_id", "grp", "q")
    val got = GroupQuantileCut(df, "doc_id", "grp", $"q", 0.5, nBins = 8)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == (0L until 5L).toSet, got)
  }

  test("non-string and null group columns work (string-rendered internally)") {
    val df = (0L until 40L).map(i =>
      (i, if (i % 10 == 9) None else Some(i % 3), ((i * 7) % 11) / 10.0))
      .toDF("doc_id", "grp", "q")
    val got = GroupQuantileCut(df, "doc_id", "grp", $"q", 0.5, nBins = 8)
    // per-group halves: 3 int groups of 12 and the null group of 4
    val byGroup = got.groupBy($"grp").count()
      .collect().map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)).toMap
    assert(byGroup == Map(Some("0") -> 6L, Some("1") -> 6L, Some("2") -> 6L,
      None -> 2L), byGroup)
  }

  test("checked-bound dispatch: a high-cardinality group falls back to the window path, same answer") {
    // group = the id itself — the adversarial caller the histogram path
    // must NOT collect (groups × nBins would be data-sized). Forcing the
    // ceiling down proves the dispatch fires; the two paths must agree.
    val df = corpus(200, 3)
    val hist = GroupQuantileCut(df, "doc_id", "grp", $"q", 0.4, nBins = 16)
      .select($"doc_id").as[Long].collect().toSet
    val fell = GroupQuantileCut(df, "doc_id", "grp", $"q", 0.4, nBins = 16,
      maxDriverCells = 1L) // everything exceeds: always the window path
    assert(fell.select($"doc_id").as[Long].collect().toSet == hist,
      "the fallback must be the same exact semantics")
    // genuinely high-cardinality group under the DEFAULT ceiling check:
    // id-as-group with a tiny ceiling still answers exactly
    val perId = GroupQuantileCut(df.withColumn("g2", $"doc_id"),
      "doc_id", "g2", $"q", 1.0, nBins = 16, maxDriverCells = 64L)
    assert(perId.count() == 200L, "frac=1 keeps every row in every group")
  }

  test("per-group quotas are independent — a dominant group cannot starve others") {
    val df = corpus(300, 2).unionByName(
      (1000L until 1010L).map(i => (i, "small", (i % 7) / 10.0))
        .toDF("doc_id", "grp", "q"))
    val got = GroupQuantileCut(df, "doc_id", "grp", $"q", 0.3, nBins = 16)
    val byGroup = got.groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(byGroup("small") == 3L, byGroup)
    assert(byGroup("g0") == 45L && byGroup("g1") == 45L, byGroup)
  }
}
