package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),    // close to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal to 0
      (3L, Array(-1.0f, 0.0f, 0.0f)),   // opposite of 0
      (4L, Array(1.0f, 0.05f, 0.0f))    // closest to 0
    ).toDF("vec_id", "embedding")
  }

  test("dot / norm / cosine expressions") {
    import spark.implicits._
    val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(
        Similarity.dot(col("a"), col("b")).as("d"),
        Similarity.norm(col("a")).as("n"),
        round(Similarity.cosine(col("a"), col("a")), 9).as("self"))
      .as[(Double, Double, Double)].head()
    assert(r._1 == 11.0)
    assert(math.abs(r._2 - math.sqrt(5)) < 1e-12)
    assert(r._3 == 1.0)
  }

  test("brute-force top-k ranks by cosine, excludes self") {
    import spark.implicits._
    val r = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        isQuery = col("vec_id") === 0, k = 3)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(4L, 1L, 2L), s"got $r")
  }

  test("sign bucket groups same-orthant vectors; lsh top-k searches within bucket") {
    import spark.implicits._
    val b = vecs.select(col("vec_id"),
        Similarity.signBucket(col("embedding"), Seq(0, 1)).as("bucket"))
      .as[(Long, String)].collect().toMap
    assert(b(0L) == b(1L) && b(0L) == b(4L))
    assert(b(2L) == b(0L), "zero components count as non-negative sign")
    assert(b(3L) != b(0L))
    val r = Similarity.lshTopK(vecs, "vec_id", "embedding",
        isQuery = col("vec_id") === 0, k = 5, dims = Seq(0, 1))
      .select("neighbor_id").as[Long].collect().toSet
    assert(r == Set(1L, 2L, 4L), "opposite-orthant vec 3 must be pruned by the bucket")
  }

  test("multi-probe LSH dominates single-bucket LSH: per-rank cosine never worse") {
    import spark.implicits._
    // a corpus with query near-neighbors that sit ONE sign flip away from
    // the query's bucket: single-bucket LSH misses them, a Hamming-1 probe
    // finds them
    val rng = new scala.util.Random(7)
    val corpus = (0L until 60L).map { i =>
      (i, Array.fill(4)((rng.nextInt(9) - 4).toFloat))
    }.filter(!_._2.forall(_ == 0f)).toDF("vec_id", "embedding")
    val dims = Seq(0, 1, 2, 3)
    val isQ = col("vec_id") % 10 === 0
    def byRank(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getDouble(2)).toMap
    val single = byRank(Similarity.lshTopK(corpus, "vec_id", "embedding",
      isQ, k = 3, dims))
    val multi = byRank(Similarity.lshMultiProbeTopK(corpus, "vec_id", "embedding",
      isQ, k = 3, dims))
    // multi-probe's candidate set is a strict superset (own bucket is
    // probed too), so at every (query, rank) its cosine is >= single's
    single.foreach { case (key, cs) =>
      assert(multi.contains(key) && multi(key) >= cs,
        s"rank $key: multi ${multi.get(key)} < single $cs")
    }
    assert(multi.size >= single.size)
  }

  test("IVF sweep: candidate sets nest and recall@3 is monotone in nProbe") {
    import spark.implicits._
    // deterministic pseudo-random corpus; integer components keep the
    // double arithmetic exact, zero vectors bumped (cosine undefined)
    val rnd = new scala.util.Random(42)
    val rows = (0L until 60L).map { i =>
      val v = Array.fill(8)((rnd.nextInt(21) - 10).toFloat)
      (i, if (v.forall(_ == 0f)) v.updated(0, 1.0f) else v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val isQ = col("vec_id") % 5 === 0
    val cells = CellAssignment.collect(df, "vec_id", "embedding",
      col("vec_id") % 5 === 1)
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", isQ, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(desc("cosine_sim"), asc("neighbor_id"))
    var prevCand = Set.empty[(Long, Long)]
    var prevHits = -1
    for (p <- Seq(1, 2, 3, 6, 12)) {
      val cand = Similarity.ivfScoredCandidatesFromCells(
        cells, df, "vec_id", "embedding", isQ, p)
      val candSet = cand.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      assert(prevCand.subsetOf(candSet),
        s"p=$p candidates must contain every p-1 candidate (best-first probes)")
      val hits = cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .count(exact.contains)
      assert(hits >= prevHits, s"recall@3 regressed at p=$p: $hits < $prevHits")
      prevCand = candSet
      prevHits = hits
    }
    // at nProbe = all cells the probe covers everything: recall must be 1
    assert(prevCand.size >= exact.size)
    assert(prevHits == exact.size,
      s"full probe must recover brute force: $prevHits vs ${exact.size}")
  }

  test("near-dup pairs above threshold") {
    import spark.implicits._
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 4L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("LSH candidates are a subset of exact all-pairs results, with usable recall") {
    // Independent validation of the banding scheme itself (the generated
    // DuckDB oracle shares the banding constants, so a conceptual error in
    // the scheme would pass the oracle; this small-N exact check would not).
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(120)
    val threshold = 0.25
    val lsh = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact all-pairs ground truth (120×120 — fine at test scale only)
    val base = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val exact = base.as("a").crossJoin(base.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cs"))
      .filter(col("cs") >= threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact),
      s"LSH emitted false pairs: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    // Theory floor, not a vibes floor: P(candidate) = 1-(1-p^6)^8 with
    // p = 1-θ/π is ≈0.27 for a pair sitting exactly AT cosine 0.25 and rises
    // with similarity, so aggregate recall over everything ≥ threshold must
    // clear ~0.27 minus sampling noise. Catches a broken banding scheme
    // (recall ≈ 0 or ≈ n² candidates), which the generated oracle cannot.
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.15, s"recall $recall below LSH theory (${lsh.size}/${exact.size})")
  }

  test("bucket-size cap drops hot-bucket members from candidate generation") {
    import spark.implicits._
    // 4 identical vectors form one hot bucket of 4 + 1 outlier elsewhere
    val v8 = (0L to 3L).map(i => (i, Array.fill(8)(1.0f))) :+ (9L, Array.fill(8)(-1.0f))
    val df = v8.toDF("vec_id", "embedding")
    val uncapped = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      threshold = -1.0, bandBits = 8, nBands = 1)
    assert(uncapped.count() == 6) // C(4,2) within the hot bucket
    val capped = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      threshold = -1.0, bandBits = 8, nBands = 1, maxBucketSize = Some(3))
    assert(capped.count() == 0) // hot bucket dropped entirely
  }

  test("near-dup banding prunes opposite-sign pairs before scoring") {
    import spark.implicits._
    // 8-dim vectors, one band of 8 bits: vec 1 shares vec 0's signs (same
    // bucket, scored and kept); vec 2 is vec 0 negated (different bucket —
    // never a candidate, even at threshold -1 which all-pairs would pass).
    val v8 = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(-1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(v8, "vec_id", "embedding",
        threshold = -1.0, bandBits = 8, nBands = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}
