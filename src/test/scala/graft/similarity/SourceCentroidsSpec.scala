package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for e_source_centroids (group-centroid cosine matrix). */
class SourceCentroidsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("one row per unordered source pair, cosines in range") {
    val rows = SparkEntry.queries("e_source_centroids")(spark, d).collect()
    val nSources = Tables.documents(spark, d)
      .select(countDistinct(col("source"))).head().getLong(0).toInt
    assert(rows.length == nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not ordered src_a < src_b")
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
    }
    // every source appears in exactly nSources-1 pairs
    val occur = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size)
    assert(occur.values.forall(_ == nSources - 1))
  }

  test("a group joined with itself scores cosine 1") {
    import spark.implicits._
    val vecs = Seq(
      ("g1", Array(1.0f, 2.0f, 3.0f)), ("g1", Array(1.0f, 2.0f, 3.0f)),
      ("g2", Array(2.0f, 4.0f, 6.0f))  // same direction, different norm
    ).toDF("g", "v")
    val r = Similarity.groupCentroidSimilarity(vecs, "g", "v").collect()
    assert(r.length == 1 && math.abs(r(0).getDouble(2) - 1.0) < 1e-6)
  }
}
