package graft.similarity

import graft.plans.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the clustering
  * primitive behind semantic dedup and diversity-balanced mixture sampling
  * (cluster the corpus in embedding space, then dedup/sample WITHIN
  * clusters). Everything is reproducible: centroids initialize from a
  * caller-supplied deterministic predicate (no RNG, no seed), ids assigned
  * in vec_id order, and the argmin tie-breaks on (distance, cluster id).
  *
  * Plan shape per iteration — the 100 TB shape, not the relational n×k×d
  * explode-join:
  *
  *  1. ASSIGN: the k centroids ride along as ONE codegen reference object
  *     (collected driver-side — k·d doubles, bounded like ScalableNtile's
  *     histogram); each row runs the native `NearestCentroid` argmin —
  *     |v|² once, then k primitive-array passes of the expansion
  *     |v|² − 2·v·c + |c|² (|c|² precomputed at plan time) — a NARROW
  *     scan, zero exchanges, no join against a centroid table, no per-row
  *     struct allocations.
  *  2. UPDATE: new centroid j = per-dimension mean of its members, as d
  *     explicit `avg(element_at(v, i))` aggregates — hash aggregation with
  *     map-side partial combine, so the shuffle carries one row per
  *     (cluster × partition), never the vectors themselves. (The explode
  *     to (cid, pos, x) + groupBy would shuffle n·d rows — the oracle's
  *     relational form, correct but not the plan you want at scale.)
  *
  * An empty cluster simply drops out (no member rows → no update row),
  * matching the SQL formulation.
  *
  * FP note: distances use the expanded form; near v ≈ c the cancellation
  * error is ~1e-12 ABSOLUTE, far inside the round-6 output grid, and
  * assignment flips would need two centroids within float-noise of
  * equidistant. Elements are cast to double before any arithmetic
  * (float accumulation drifts at ~1e-7 relative — outside the grid). */
object KMeans {

  /** Cluster assignment after `iterations` Lloyd rounds.
    * Returns (vec_id, cluster_id, dist2) — dist2 = squared L2 distance to
    * the final centroid, rounded to 6 decimals. */
  def lloyd(vectors: DataFrame, idCol: String, vecCol: String,
            isInit: Column, iterations: Int): DataFrame =
    summarize(assignments(vectors, idCol, vecCol, isInit, iterations))

  /** The rounded public view of a raw [[assignments]] frame:
    * (vec_id, cluster_id, dist2). */
  def summarize(assigned: DataFrame): DataFrame =
    assigned.select(col("vec_id"), col("cid").as("cluster_id"),
      round(col("d2"), 6).as("dist2"))

  /** Per-cluster distance outliers over a raw [[assignments]] frame: the
    * z-score of each vector's squared centroid distance against its
    * cluster's population mean/stddev, and an `is_outlier` 0/1 flag at
    * `zCut`. The embedding-space quality filter that complements SemDeDup:
    * where SemDeDup drops the DENSE duplicated cores, this flags the
    * sparse far tail — mislabeled, off-distribution, or garbage vectors
    * that sit far from every semantic neighborhood.
    *
    * Scale shape: one k-row stats aggregation (map-side combined),
    * broadcast back onto the assignment — the embedding column itself is
    * not touched, so nothing wide shuffles. A singleton or perfectly
    * tight cluster (σ = 0) defines z = 0: no member of a degenerate
    * cluster is an outlier by this test. */
  def distanceOutliers(assigned: DataFrame, zCut: Double): DataFrame = {
    val stats = assigned.groupBy(col("cid"))
      .agg(avg(col("d2")).as("mu"), stddev_pop(col("d2")).as("sigma"))
    val z = when(col("sigma") > 0, (col("d2") - col("mu")) / col("sigma"))
      .otherwise(lit(0.0))
    assigned.join(broadcast(stats), Seq("cid"))
      .select(col("vec_id"), col("cid").as("cluster_id"),
        round(col("d2"), 6).as("dist2"), round(z, 6).as("z_score"),
        (z >= zCut).cast("long").as("is_outlier"))
  }

  /** Simplified (centroid-based) silhouette over a raw [[assignments]]
    * frame — the cluster-quality meter read before trusting k or the
    * init: per vector, a = distance to its OWN cluster's mean, b = the
    * nearest OTHER cluster mean, s = (b − a)/max(a, b) ∈ [−1, 1]
    * (negative = sits closer to another cluster than its own; ~0 =
    * boundary; → 1 = tight and well separated). The classic silhouette's
    * O(n²) pairwise form is replaced by the standard centroid
    * approximation — the only form that scales to a corpus.
    *
    * Scale shape: cluster means are one k×d bounded aggregation
    * (map-side combined, collected like every centroid matrix in this
    * module); per-vector distances to ALL k means are k codegen
    * `vec_dot` terms in ONE narrow scan over the memoized assignment —
    * no join, no shuffle, embeddings never leave the scan. */
  def silhouette(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    // degenerate inputs: no rows → no scores (head() below would throw);
    // a single cluster has no "nearest other" — the conventional score is
    // 0 for every member (not the -1 the b=0 formula would yield)
    val first = assigned.select(size(col("v"))).take(1)
    if (first.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id BIGINT, cluster_id BIGINT, a_dist DOUBLE, b_dist DOUBLE, silhouette DOUBLE"))
    val dims = first.head.getInt(0)
    val aggs = (1 to dims).map(i => avg(element_at(col("v"), i)).as(s"c$i"))
    val means: Seq[(Long, Array[Double])] = assigned.groupBy(col("cid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getLong(0), (1 to dims).map(i => r.getDouble(i)).toArray))
      .sortBy(_._1).toSeq
    if (means.length == 1) {
      // k = 1: the own-mean distance exists (same expansion as the main
      // path) but there is no "nearest other" cluster; score 0 by
      // convention, b_dist undefined (null) — not the -1 that b = 0
      // would produce
      val c = means.head._2
      val vv1 = VectorExpressions.vecDot(col("v"), col("v"))
      val md2 = vv1 -
        lit(2.0) * VectorExpressions.vecDot(col("v"), typedLit(c.toSeq)) +
        lit(c.map(x => x * x).sum)
      val a1 = sqrt(greatest(md2, lit(0.0)))
      return assigned.select(col("vec_id"), col("cid").as("cluster_id"),
        round(a1, 6).as("a_dist"), lit(null).cast("double").as("b_dist"),
        lit(0.0).as("silhouette"))
    }
    // d²(v, c) = |v|² − 2·v·c + |c|² — the NearestCentroid expansion, so
    // 6-dp parity with the assignment path holds
    val vv = VectorExpressions.vecDot(col("v"), col("v"))
    val dists = array(means.map { case (cid, c) =>
      val cNorm = c.map(x => x * x).sum
      struct(lit(cid).as("mcid"),
        (vv - lit(2.0) * VectorExpressions.vecDot(col("v"), typedLit(c.toSeq)) +
          lit(cNorm)).as("md2"))
    }: _*)
    // own/other split is in-row over the k-element struct array (k is the
    // cluster count — tiny; the k dot products above are the real work)
    val own = element_at(filter(col("dd"), s => s.getField("mcid") === col("cid")), 1)
      .getField("md2")
    val other = array_min(transform(
      filter(col("dd"), s => s.getField("mcid") =!= col("cid")),
      s => s.getField("md2")))
    val a = sqrt(greatest(col("a2"), lit(0.0)))
    val b = sqrt(greatest(col("b2"), lit(0.0)))
    val s = when(greatest(a, b) > 0, (b - a) / greatest(a, b)).otherwise(lit(0.0))
    assigned
      .withColumn("dd", dists)
      .withColumn("a2", own)
      .withColumn("b2", other)
      .select(col("vec_id"), col("cid").as("cluster_id"),
        round(a, 6).as("a_dist"), round(b, 6).as("b_dist"),
        round(s, 6).as("silhouette"))
  }

  /** The Lloyd rounds, keeping the double-cast vector column `v` on the
    * assignment — (vec_id, v, cid, d2) — so downstream consumers
    * (semanticDedup, a memoizing caller) can reuse one computed assignment
    * across several derived queries. */
  def assignments(vectors: DataFrame, idCol: String, vecCol: String,
                  isInit: Column, iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one assignment pass")
    val toDouble = transform(col(vecCol), x => x.cast("double"))
    val base = vectors.select(col(idCol).cast("long").as("vec_id"),
      toDouble.as("v"))
    val dims = base.select(size(col("v"))).head().getInt(0)

    // deterministic init: predicate rows in vec_id order become clusters 1..k
    var centroids: Seq[(Long, Array[Double])] = vectors.filter(isInit)
      .select(col(idCol).cast("long"), toDouble)
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => ((i + 1).toLong, r.getSeq[Double](1).toArray) }
      .toSeq
    require(centroids.nonEmpty, "isInit selected no centroid rows")

    var assigned = assign(base, centroids)
    (2 to iterations).foreach { _ =>
      // per-dimension means, map-side combined; one bounded collect
      val aggs = (1 to dims).map(i => avg(element_at(col("v"), i)).as(s"c$i"))
      centroids = assigned.groupBy(col("cid"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => (r.getLong(0), (1 to dims).map(i => r.getDouble(i)).toArray))
        .sortBy(_._1).toSeq
      assigned = assign(base, centroids)
    }
    assigned
  }

  /** SemDeDup-style semantic deduplication: cluster in embedding space,
    * find near-identical pairs WITHIN each cluster by exact cosine, and
    * keep one representative per connected near-dup group.
    *
    * The k-means cluster plays the LSH-bucket role: the candidate self-join
    * is an equi-join on cluster id, so pair work is ∑ cluster_size² — never
    * the corpus-wide n² product (same scaling argument as the banded-LSH
    * near-dup path, different geometry: k-means buckets are data-adaptive
    * where LSH bands are random). Representatives come from bounded label
    * propagation over the pair graph (3 rounds — same operator the MinHash
    * cluster path uses), tie-broken to the minimum vec_id.
    *
    * Caveat inherited from SemDeDup: pairs STRADDLING two clusters are not
    * examined (that is the pruning); raise `iterations` or k for tighter
    * clusters, or run the banded-LSH near-dup pass for recall guarantees.
    *
    * Returns (vec_id, cluster_id, rep_id, kept): `rep_id` is the group
    * representative the row dedups to; `kept` marks the representative row
    * itself (the surviving corpus is `filter(col("kept"))`). */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
                    isInit: Column, iterations: Int,
                    minCosine: Double): DataFrame =
    semanticDedupAssigned(
      assignments(vectors, idCol, vecCol, isInit, iterations), minCosine)

  /** [[semanticDedup]] over a precomputed raw [[assignments]] frame. */
  def semanticDedupAssigned(assigned: DataFrame, minCosine: Double): DataFrame = {
    val nrm = sqrt(VectorExpressions.vecDot(col("v"), col("v")))
    val members = assigned.select(col("vec_id"), col("v"), col("cid"),
      nrm.as("nrm"))
    def side(s: String) = members.select(col("cid"),
      col("vec_id").as(s"id_$s"), col("v").as(s"v_$s"), col("nrm").as(s"n_$s"))
    val pairs = side("a").join(side("b"), Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(
        VectorExpressions.vecDot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")),
        6) >= minCosine)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val reps = graft.dedup.Dedup.labelPropagationClusters(
      pairs, members.select(col("vec_id").as("doc_id")), "doc_id", iterations = 3)
      .select(col("doc_id").as("vec_id"), col("cluster_id").as("rep_id"))
    assigned.select(col("vec_id"), col("cid").as("cluster_id"))
      .join(reps, Seq("vec_id"))
      .withColumn("kept", col("rep_id") === col("vec_id"))
  }

  /** Cluster-balanced diversity sampling: at most `perCluster` members of
    * each k-means cluster, ranked by squared distance to their centroid —
    * `farthest = true` (default) keeps the most PERIPHERAL members (the
    * diversity-preserving cut: every region of embedding space keeps its
    * outliers, dense duplicated cores shrink), `false` keeps the most
    * prototypical. Deterministic: rank on (rounded dist2, vec_id).
    *
    * Plan: one narrow lloyd assignment + [[graft.operators.GroupedTopK]]'s
    * bounded-buffer Aggregator for the per-cluster cut — the exchange
    * carries at most perCluster rows per (cluster × map partition), and no
    * cluster's members ever funnel through a single sort task. (The window
    * form — `row_number().over(partitionBy(cluster_id))` — caps
    * parallelism at k tasks each sorting ~n/k rows: a near-global sort at
    * corpus scale. It survives as [[diversitySampleWindowReference]], the
    * spec's oracle for this Aggregator.) */
  def diversitySample(vectors: DataFrame, idCol: String, vecCol: String,
                      isInit: Column, iterations: Int, perCluster: Int,
                      farthest: Boolean = true): DataFrame =
    diversitySampleSummarized(
      lloyd(vectors, idCol, vecCol, isInit, iterations), perCluster, farthest)

  /** [[diversitySample]] over a precomputed [[lloyd]]/[[summarize]] frame.
    * Returns (vec_id, cluster_id, dist2, rank). */
  def diversitySampleSummarized(assigned: DataFrame, perCluster: Int,
                                farthest: Boolean = true): DataFrame = {
    require(perCluster >= 1, "perCluster must be >= 1")
    // GroupedTopK orders (score desc, id asc); negate for the
    // nearest-first cut. Double negation restores the sign bit exactly
    // (-(-0.0) == 0.0 bit-for-bit), so dist2 round-trips unchanged.
    val score = if (farthest) col("dist2") else -col("dist2")
    graft.operators.GroupedTopK
      .topKPerKey(assigned.withColumn("score", score),
        "cluster_id", "score", "vec_id", perCluster)
      .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"),
        (if (farthest) col("score") else -col("score")).as("dist2"),
        col("rank"))
  }

  /** The windowed form of [[diversitySampleSummarized]] — kept ONLY as the
    * specs' reference implementation (bit-identical semantics, simpler to
    * audit). Not a production path: `partitionBy(cluster_id)` bounds
    * parallelism by k and sorts whole clusters through single tasks. */
  private[graft] def diversitySampleWindowReference(
      assigned: DataFrame, perCluster: Int,
      farthest: Boolean = true): DataFrame = {
    require(perCluster >= 1, "perCluster must be >= 1")
    val ord =
      if (farthest) Seq(col("dist2").desc, col("vec_id").asc)
      else Seq(col("dist2").asc, col("vec_id").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(ord: _*)
    assigned
      .select(col("vec_id"), col("cluster_id"), col("dist2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perCluster)
  }

  /** Narrow argmin assignment: the whole centroid matrix rides along the
    * scan as one codegen reference (native NearestCentroid) — no join, no
    * exchange, no per-row struct array. */
  private def assign(base: DataFrame,
                     centroids: Seq[(Long, Array[Double])]): DataFrame = {
    val best = VectorExpressions.nearestCentroid(col("v"),
      centroids.map(_._1).toArray, centroids.map(_._2).toArray)
    base
      .withColumn("best", best)
      .select(col("vec_id"), col("v"),
        col("best.cid").as("cid"), col("best.d2").as("d2"))
  }
}
