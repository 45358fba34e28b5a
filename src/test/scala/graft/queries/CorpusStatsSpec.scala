package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the corpus-statistics queries added in round 11:
  * Matryoshka truncation recall, distinct-n diversity, Zipf slope. */
class CorpusStatsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("e_matryoshka_recall: one row per prefix width, recall bounded") {
    val rows = SparkEntry.queries("e_matryoshka_recall")(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    val nQ = Tables.embeddings(spark, d)
      .filter(col("vec_id") % 50 === 0).count()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 3 * nQ,
        s"n_hits ${r.getLong(1)} outside [0, ${3 * nQ}]")
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $rec")
    }
    // the full 64-dim list is its own ground truth, so SOME prefix must
    // recover at least one neighbor on this corpus
    assert(rows.map(_.getLong(1)).max > 0L, "every prefix recalled nothing")
  }

  test("e_distinct_n: per (source, n) ratios are consistent") {
    val rows = SparkEntry.queries("e_distinct_n")(spark, d).collect()
    assert(rows.nonEmpty)
    val nSources = Tables.documents(spark, d)
      .select(countDistinct(col("source"))).head().getLong(0)
    assert(rows.length == 3 * nSources,
      s"expected ${3 * nSources} rows, got ${rows.length}")
    rows.foreach { r =>
      val (grams, distinct) = (r.getLong(2), r.getLong(3))
      assert(distinct >= 1L && distinct <= grams,
        s"distinct $distinct outside [1, $grams]")
      val ratio = r.getDouble(4)
      assert(ratio > 0.0 && ratio <= 1.0, s"ratio out of range: $ratio")
    }
  }

  test("e_zipf_slope: single fitted row with a negative slope") {
    val rows = SparkEntry.queries("e_zipf_slope")(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) >= 2L, "need at least two points to fit")
    assert(r.getDouble(1) < 0.0,
      s"token frequencies must fall with rank (slope ${r.getDouble(1)})")
  }
}
