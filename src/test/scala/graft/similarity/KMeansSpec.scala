package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  // two tight blobs around (0,0) and (10,10); ids 1 and 4 seed the clusters
  private def blobs = {
    import spark.implicits._
    Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.5f, -0.5f)),
      (3L, Array(-0.5f, 0.5f)),
      (4L, Array(10.0f, 10.0f)),
      (5L, Array(10.5f, 9.5f)),
      (6L, Array(9.5f, 10.5f))
    ).toDF("vec_id", "embedding")
  }

  test("separable blobs cluster correctly and deterministically") {
    val got = KMeans.lloyd(blobs, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 4L), iterations = 3)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L))
  }

  test("dist2 is the squared distance to the FINAL (updated) centroid") {
    val got = KMeans.lloyd(blobs, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 4L), iterations = 2)
      .filter(col("vec_id") === 1L).head().getDouble(2)
    // after one update, centroid 1 = mean of blob 1 = (0,0); dist2(v1) = 0
    assert(got == 0.0, s"got $got")
  }

  test("equidistant vector tie-breaks to the lower cluster id") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)) // exactly between both centroids
    ).toDF("vec_id", "embedding")
    val got = KMeans.lloyd(df, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 2L), iterations = 1)
      .filter(col("vec_id") === 3L).head().getLong(1)
    assert(got == 1L, "ties must resolve to the smaller cluster id")
  }

  test("assignment pass is narrow: no joins, no exchanges in the plan") {
    val plan = KMeans.lloyd(blobs, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 4L), iterations = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"centroid assignment must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment must be shuffle-free:\n$plan")
  }

  test("semanticDedup: near-identical in-cluster vectors collapse to the min-id rep") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),    // cluster 1 seed
      (2L, Array(0.999f, 0.02f)), // cos≈1 with v1 → dedups to 1
      (3L, Array(0.0f, 1.0f)),    // same cluster, orthogonal → kept
      (6L, Array(10.0f, 10.0f)),  // cluster 2 seed
      (7L, Array(10.1f, 9.9f))    // cos≈1 with v6 → dedups to 6
    ).toDF("vec_id", "embedding")
    val got = KMeans.semanticDedup(df, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 6L), iterations = 2, minCosine = 0.95)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (6L, 6L, true), (7L, 6L, false)), s"got ${got.toSeq}")
  }

  test("semanticDedup: cross-cluster near-dups are NOT examined (the documented pruning)") {
    import spark.implicits._
    // v3 is nearly parallel to v1 in direction but lands in cluster 2 by
    // distance; SemDeDup's contract prunes that pair away
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(20.0f, 1.0f)),
      (3L, Array(19.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val got = KMeans.semanticDedup(df, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 2L), iterations = 1, minCosine = 0.9)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    // 2 and 3 share a cluster (both near (20,1)) and are near-parallel → 3 drops;
    // 1 is alone in its cluster and survives even though cos(1,3) > 0.9
    assert(got.toSeq == Seq((1L, true), (2L, true), (3L, false)), s"got ${got.toSeq}")
  }

  test("diversitySample keeps the most peripheral members per cluster") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),   // cluster 1 center
      (2L, Array(0.1f, 0.0f)),   // near core
      (3L, Array(3.0f, 0.0f)),   // peripheral
      (4L, Array(0.0f, 2.0f)),   // peripheral
      (6L, Array(50.0f, 50.0f))  // cluster 2, alone
    ).toDF("vec_id", "embedding")
    val got = KMeans.diversitySample(df, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 6L), iterations = 1, perCluster = 2)
      .orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    // cluster 1 keeps its two farthest-from-centroid members (3, 4); the
    // core rows 1 and 2 drop; cluster 2's only member always survives
    assert(got == Seq(3L, 4L, 6L), s"got $got")
  }

  test("diversitySample aggregator form matches the window reference, both directions") {
    import spark.implicits._
    // ties on dist2 inside a cluster exercise the (dist2, vec_id) tie-break
    val assigned = Seq(
      (1L, 1L, 0.0), (2L, 1L, 4.0), (3L, 1L, 4.0), (4L, 1L, 9.0),
      (5L, 2L, 1.0), (6L, 2L, 1.0), (7L, 2L, 0.0),
      (8L, 3L, 2.5)
    ).toDF("vec_id", "cluster_id", "dist2")
    for (farthest <- Seq(true, false)) {
      val viaAgg = KMeans.diversitySampleSummarized(assigned, perCluster = 2, farthest)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val viaWin = KMeans.diversitySampleWindowReference(assigned, perCluster = 2, farthest)
        .select(col("vec_id"), col("cluster_id"), col("dist2"), col("rank"))
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      assert(viaAgg.toSeq == viaWin.toSeq, s"farthest=$farthest")
    }
  }

  test("diversitySample plan: bounded aggregator, no per-cluster window") {
    import spark.implicits._
    val assigned = (1 to 100).map(i => (i.toLong, (i % 5).toLong, (i % 13).toDouble))
      .toDF("vec_id", "cluster_id", "dist2")
    val plan = KMeans.diversitySampleSummarized(assigned, perCluster = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"diversity cut must not sort whole clusters through window tasks:\n$plan")
  }

  test("silhouette: empty input yields an empty result, not an exception") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Double], Long, Double)]
      .toDF("vec_id", "v", "cid", "d2")
    val out = KMeans.silhouette(empty)
    assert(out.columns.toSeq ==
      Seq("vec_id", "cluster_id", "a_dist", "b_dist", "silhouette"))
    assert(out.count() == 0)
  }

  test("silhouette: a single cluster scores 0 by convention, not -1") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val assigned = KMeans.assignments(df, "vec_id", "embedding",
      isInit = col("vec_id") === 1L, iterations = 2)
    val got = KMeans.silhouette(assigned).orderBy("vec_id").collect()
    assert(got.forall(_.getDouble(4) == 0.0),
      s"k=1 silhouette must be 0: ${got.mkString(",")}")
    assert(got.forall(_.isNullAt(3)), "b_dist undefined at k=1")
    // mean = (1,0): both members sit at distance 1 from it
    assert(got.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6))
  }

  test("empty clusters drop out instead of producing NaN centroids") {
    import spark.implicits._
    // centroid 2 seeds far away and captures nobody after the update
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.1f, 0.1f)),
      (3L, Array(0.2f, 0.0f)),
      (9L, Array(100.0f, 100.0f)) // isInit but also nearest to itself
    ).toDF("vec_id", "embedding")
    val out = KMeans.lloyd(df, "vec_id", "embedding",
        isInit = col("vec_id").isin(1L, 9L), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(9L) == 2L && out(1L) == 1L && out.size == 4)
  }

  test("distance outliers: z-scores match hand stats; singleton cluster never flags") {
    import spark.implicits._
    // cluster 1: three members at d2 = {0, 1, 1} after the update round
    // is skipped (iterations = 1 assigns against the SEED centroids);
    // cluster 2: a singleton (sigma 0 -> z 0, never an outlier)
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)),
      (9L, Array(100.0f, 100.0f))
    ).toDF("vec_id", "embedding")
    val assigned = KMeans.assignments(df, "vec_id", "embedding",
      isInit = col("vec_id").isin(1L, 9L), iterations = 1)
    val got = KMeans.distanceOutliers(assigned, zCut = 1.0)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
    // d2 = {0,1,1}: mu = 2/3, sigma_pop = sqrt(2)/3; z(0) = -sqrt(2),
    // z(1) = 1/sqrt(2) < 1 -> nothing in cluster 1 flags at zCut 1
    assert(math.abs(got(1L)._1 - -math.sqrt(2.0)) < 1e-6)
    assert(math.abs(got(2L)._1 - 1.0 / math.sqrt(2.0)) < 1e-6)
    assert(got.values.forall(_._2 == 0L))
    // drop the cut to 0.5: the two d2=1 rows flag, the singleton still not
    val flagged = KMeans.distanceOutliers(assigned, zCut = 0.5)
      .filter(col("is_outlier") === 1L).collect().map(_.getLong(0)).toSet
    assert(flagged == Set(2L, 3L))
  }
}
