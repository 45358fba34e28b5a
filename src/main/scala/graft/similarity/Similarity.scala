package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * The arrays stay packed end-to-end: dot products and norms use
  * `zip_with` + `aggregate` (sequential fold, codegen'd) rather than
  * exploding to one-row-per-dimension — a 64× row-count saving that is the
  * difference between a shuffle of vectors and a shuffle of elements at
  * 100 TB. Elements are cast to double before any arithmetic so results are
  * deterministic and engine-comparable.
  *
  *  - brute-force: query-set × corpus block product (broadcast the query
  *    side), per-query top-k via window;
  *  - LSH-bucketed: sign-bit bucket on fixed dims prunes the corpus per
  *    query (an IVF-style coarse quantization with deterministic planes).
  */
object Similarity {

  /** Σ aᵢ·bᵢ over float arrays — the native codegen expression
    * (graft.plans.DotProduct). Sums in ascending index order, bit-identical
    * to the sequential `aggregate(zip_with(...))` fold it replaced (the
    * composable form survives as `dotHof` for non-float arrays). */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecDot(a, b)

  /** Composable higher-order-function form (any numeric element type);
    * interpreted, so ~3-5× slower than `dot` in the inner loop. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k. `isQuery` marks the query subset; every query
    * is scored against the whole corpus (minus itself).
    * Returns (query_id, neighbor_id, cosine_sim, rank), rank 1..k.
    * Ranking uses the ROUNDED cosine (6 dp) with id tie-break so the order
    * is reproducible across engines and runs. */
  def bruteForceTopK(vecs: DataFrame, idCol: String, embCol: String,
                     isQuery: Column, k: Int): DataFrame = {
    // Norms are computed ONCE per vector, not per pair: zip_with/aggregate
    // are interpreted (non-codegen) expressions, so the per-pair work must
    // be exactly one dot product.
    val queries = vecs.filter(isQuery)
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        norm(col(embCol)).as("q_norm"))
    val corpus = vecs
      .select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
        norm(col(embCol)).as("c_norm"))
    val scored = broadcast(queries).crossJoin(corpus)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6)
          .as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic sign-bit bucket over `dims` (IVF-style coarse cells):
    * bit d = 1 iff embedding[d] >= 0. */
  def signBucket(emb: Column, dims: Seq[Int]): Column =
    concat(dims.map(i => when(try_element_at(emb, lit(i + 1)) >= 0f, "1").otherwise("0")): _*)

  /** LSH-bucketed ANN top-k: queries only score corpus vectors in the same
    * sign bucket. Recall < 1 by construction; the bucket fan-out is the
    * scale knob (more dims → smaller cells → faster, lower recall). */
  def lshTopK(vecs: DataFrame, idCol: String, embCol: String,
              isQuery: Column, k: Int, dims: Seq[Int] = Seq(0, 8, 16, 24)): DataFrame = {
    val bucketed = vecs.withColumn("bucket", signBucket(col(embCol), dims))
    val queries = bucketed.filter(isQuery)
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        norm(col(embCol)).as("q_norm"), col("bucket"))
    val corpus = bucketed
      .select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
        norm(col(embCol)).as("c_norm"), col("bucket"))
    val scored = broadcast(queries).join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6)
          .as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Multi-probe LSH ANN: each query probes its own sign bucket AND every
    * Hamming-1 neighbor bucket (one sign flipped). The published recall
    * remedy for LSH's near-miss problem — a vector one sign flip away from
    * the query's bucket is invisible to [[lshTopK]] — that costs
    * (|dims|+1)× probe fan-out instead of maintaining extra hash tables
    * (the same recall/space trade multi-probe LSH, Lv et al. VLDB'07,
    * formalizes). Corpus vectors live in exactly one bucket and the probe
    * buckets of a query are pairwise distinct, so no candidate pair is
    * generated twice — no post-join distinct.
    *
    * Plan shape: identical to [[lshTopK]] — the (still tiny) exploded
    * query×probe table broadcasts against the bucketed corpus on the
    * bucket key; never a cartesian. */
  def lshMultiProbeTopK(vecs: DataFrame, idCol: String, embCol: String,
                        isQuery: Column, k: Int,
                        dims: Seq[Int] = Seq(0, 8, 16, 24)): DataFrame = {
    val d = dims.size
    val bucketed = vecs.withColumn("bucket", signBucket(col(embCol), dims))
    // the query's probe list: own bucket + each single-bit flip
    val flips = (0 until d).map { i =>
      concat(
        substring(col("bucket"), 1, i),
        when(substring(col("bucket"), i + 1, 1) === "1", "0").otherwise("1"),
        substring(col("bucket"), i + 2, d))
    }
    val queries = bucketed.filter(isQuery)
      .select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
        norm(col(embCol)).as("q_norm"),
        explode(array((col("bucket") +: flips): _*)).as("bucket"))
    val corpus = bucketed
      .select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
        norm(col(embCol)).as("c_norm"), col("bucket"))
    val scored = broadcast(queries).join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")), 6)
          .as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine_sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-flat ANN: coarse-quantize the corpus into cells around sampled
    * centroid vectors, then search only the `nProbe` cells nearest to each
    * query.
    *
    * Centroids are a deterministic sample of the corpus itself (`isCentroid`)
    * — at scale you would k-means them, but the *query plan shape* is
    * identical: a small broadcast centroid table, one narrow argmax-assign
    * pass over the corpus (shuffle-free), and a per-query probe join keyed
    * on cell id. Recall grows with `nProbe`; cost scales with corpus/cells ×
    * nProbe instead of the full corpus. */
  def ivfTopK(vecs: DataFrame, idCol: String, embCol: String,
              isQuery: Column, isCentroid: Column, k: Int, nProbe: Int): DataFrame = {
    // the centroid matrix is a bounded driver artifact; cell assignment is
    // an IN-ROW argmax over it (CellAssignment) — the corpus is scanned
    // once, narrowly, instead of materializing and shuffling n×K
    // crossJoin score rows for a per-vector window
    val cells = CellAssignment.collect(vecs, idCol, embCol, isCentroid)
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine_sim"), asc("neighbor_id"))
    ivfScoredCandidatesFromCells(cells, vecs, idCol, embCol, isQuery, nProbe)
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
  }

  /** The scored IVF candidate table `(query_id, neighbor_id, cosine_sim)`
    * BEFORE the top-k cut, for a prebuilt cell matrix — the cost axis of a
    * recall/cost sweep: its row count IS the number of exact scores an IVF
    * search pays at the given `nProbe`. Candidate sets NEST as `nProbe`
    * grows (cells are probed best-first), which is what makes measured
    * recall monotone in `nProbe`. */
  def ivfScoredCandidatesFromCells(cells: CellAssignment.Cells,
                                   vecs: DataFrame, idCol: String,
                                   embCol: String, isQuery: Column,
                                   nProbe: Int): DataFrame = {
    val toDouble = transform(col(embCol), x => x.cast("double"))
    val assigned = vecs
      .select(col(idCol).as("vid"), col(embCol).as("v_emb"),
        norm(col(embCol)).as("v_norm"), toDouble.as("__vd"))
      .withColumn("cell_id",
        CellAssignment.assignedCell(cells, col("__vd")).getField("cid"))
      .select(col("vid"), col("v_emb"), col("v_norm"), col("cell_id"))
    // each query probes its nProbe nearest cells (bounded query slice)
    val probes = vecs.filter(isQuery)
      .select(col(idCol).as("qid"), col(embCol).as("q_emb"),
        norm(col(embCol)).as("q_norm"), toDouble.as("__vd"))
      .withColumn("p",
        CellAssignment.probeCells(cells, col("__vd"), nProbe))
      .select(col("qid"), col("q_emb"), col("q_norm"),
        col("p").getField("cid").as("cell_id"))
    broadcast(probes).join(assigned, Seq("cell_id"))
      .filter(col("qid") =!= col("vid"))
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        round(dot(col("q_emb"), col("v_emb")) / (col("q_norm") * col("v_norm")), 6)
          .as("cosine_sim"))
  }

  /** Per-band sign signatures: band `b` covers dims
    * `[b*bandBits, (b+1)*bandBits)`; each signature is the sign-bit string of
    * its dims. Dims past the array end read as "0", so short vectors share
    * one bucket with each other (full recall AMONG short vectors); a pair
    * mixing a short and a full-length vector only collides when the long
    * vector's band dims are all negative, so mixed-length pairs are still
    * subject to pruning. */
  def bandSignatures(emb: Column, bandBits: Int, nBands: Int): Column =
    array((0 until nBands).map { b =>
      struct(lit(b).as("band_idx"),
        signBucket(emb, (b * bandBits) until ((b + 1) * bandBits)).as("sig"))
    }: _*)

  /** Near-duplicate pairs by embedding cosine ≥ threshold (a<b, deduped),
    * with banded sign-LSH candidate generation: a pair is scored only if it
    * agrees on ALL sign bits of at least one band (the classic OR-of-ANDs
    * LSH amplification — random-hyperplane flavor, axis-aligned planes).
    *
    * Plan shape at 100 TB: explode ×nBands, one shuffle equi-join on
    * (band_idx, sig), distinct candidate pairs, two hash joins back to fetch
    * vectors, exact re-score. Never an all-pairs cross product — candidate
    * volume scales with bucket occupancy (~n²/2^bandBits per band for RANDOM
    * signs), not n². Recall is < 1 by construction and rises with similarity:
    * P(candidate) = 1-(1-p^bandBits)^nBands with p = 1-θ/π; at the defaults
    * (6 bits × 8 bands) a true near-dup at cosine 0.9 is caught with ~98%
    * probability while random pairs are pruned ~8×.
    *
    * Skew: for clustered/correlated embeddings (non-random signs) a hot
    * bucket makes the self-join output quadratic in bucket occupancy,
    * silently reintroducing near-n² work. `maxBucketSize` caps that: buckets
    * above the cap are dropped from candidate generation (recall dips only
    * for members of pathological buckets; a salting/sub-banding pass is the
    * recall-preserving upgrade). None (default) keeps exact LSH semantics. */
  def cosineNearDupPairs(vecs: DataFrame, idCol: String, embCol: String,
                         threshold: Double, bandBits: Int = 6,
                         nBands: Int = 8,
                         maxBucketSize: Option[Int] = None): DataFrame = {
    val base = vecs.select(col(idCol).as("vid"), col(embCol).as("emb"),
      norm(col(embCol)).as("nrm"))
    val allBands = base
      .select(col("vid"),
        explode(bandSignatures(col("emb"), bandBits, nBands)).as("bs"))
      .select(col("vid"), col("bs.band_idx").as("band_idx"),
        col("bs.sig").as("sig"))
    val exploded = maxBucketSize match {
      case None => allBands
      case Some(cap) =>
        // window count per bucket, drop hot buckets: one extra shuffle on the
        // same (band_idx, sig) key the candidate join uses anyway
        val wb = Window.partitionBy(col("band_idx"), col("sig"))
        allBands.withColumn("__bn", count(lit(1)).over(wb))
          .filter(col("__bn") <= cap).drop("__bn")
    }
    val cand = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.sig") === col("b.sig") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("vid").as("id_a"), col("emb").as("emb_a"),
        col("nrm").as("norm_a")), Seq("id_a"))
      .join(base.select(col("vid").as("id_b"), col("emb").as("emb_b"),
        col("nrm").as("norm_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")), 6)
          .as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Reciprocal-best pairs from an undirected scored pair table
    * ((id_a, id_b, sim), each pair once): keep (a, b) only when b is a's
    * highest-similarity partner AND a is b's — the mutual-NN criterion
    * that picks canonical merge partners out of a noisy candidate set
    * (a hub similar to twenty documents mutual-matches at most one of
    * them). Ties break to the smallest partner id, so the result is a
    * pure function of the pair table.
    *
    * Scale shape: one symmetrize + one map-side-combined argmax
    * aggregation (min-struct, no window) down to ONE row per id, then a
    * self-equi-join of that id-sized best table. Never touches
    * embeddings — works on whatever bounded candidate table the banded
    * LSH produced. */
  /** Pairwise cosine between per-group centroid embeddings — dataset
    * similarity in embedding space (which sources/feeds cover the same
    * semantic region), the semantic counterpart to token-set overlap
    * reports. Centroid components round to 6 dp BEFORE the cosine so
    * both engines feed identical inputs into the pair arithmetic.
    *
    * Scale shape: ONE map-side-combined per-dimension mean aggregation
    * over the corpus (groups × dims bounded output), then the pair
    * product over the groups-sized centroid table — the non-equi `<`
    * self-join is groups²-bounded by construction, never corpus-sized. */
  def groupCentroidSimilarity(df: DataFrame, groupCol: String,
                              vecCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val dims = base.select(size(col("v"))).head().getInt(0)
    val aggs = (1 to dims)
      .map(i => round(avg(element_at(col("v"), i)), 6).as(s"c$i"))
    val cents = base.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      .select(col("g"),
        array((1 to dims).map(i => col(s"c$i")): _*).as("c"))
    val withNorm = cents
      .select(col("g"), col("c"), norm(col("c")).as("nrm"))
    withNorm.as("a")
      .join(withNorm.as("b"), col("a.g") < col("b.g"))
      .select(col("a.g").as("src_a"), col("b.g").as("src_b"),
        round(dot(col("a.c"), col("b.c")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("centroid_cosine"))
  }

  /** CLIP-style cross-modal alignment check — the mismatched-caption
    * filter of a multimodal corpus: for each (text, image) pair whose
    * embeddings live in a SHARED space, report the pair's cosine
    * agreement, both sides' IVF cell under the shared coarse quantizer,
    * and the aligned verdict. A caption attached to the wrong image
    * scores low cosine (and usually lands in a different cell); the
    * curation pipeline drops or re-captions those rows before training.
    *
    * `assigned` is the shared `(vec_id, v, cid)` cell-assignment artifact
    * (the same table the IVF/k-means family memoizes — KMeans.assignments
    * output), so the quantizer trains ONCE for search AND alignment.
    * `aligned` compares the 6-dp ROUNDED cosine against `minCosine` so
    * the verdict is FP-order stable across engines.
    *
    * Scale shape: two id-keyed equi-joins of the pair table against the
    * assignment artifact (each pair fetches its two vectors + cells),
    * one codegen dot product per pair — work ∝ pairs, embeddings never
    * shuffle wider than the pair fetch, nothing is pairwise-all. */
  def crossModalAlignment(pairs: DataFrame, assigned: DataFrame,
                          minCosine: Double): DataFrame = {
    val side = assigned.select(col("vec_id"), col("v"),
      col("cid"), norm(col("v")).as("nrm"))
    val cos = round(dot(col("tv"), col("iv")) / (col("tn") * col("in_")), 6)
    pairs
      .join(side.select(col("vec_id").as("text_id"), col("v").as("tv"),
        col("cid").as("text_cell"), col("nrm").as("tn")), Seq("text_id"))
      .join(side.select(col("vec_id").as("img_id"), col("v").as("iv"),
        col("cid").as("img_cell"), col("nrm").as("in_")), Seq("img_id"))
      .select(col("pair_id"), col("img_id"), cos.as("cosine"),
        col("text_cell"), col("img_cell"),
        (col("text_cell") === col("img_cell")).cast("long").as("same_cell"))
      .withColumn("aligned", (col("cosine") >= minCosine).cast("long"))
  }

  def mutualBestPairs(pairs: DataFrame, aCol: String = "id_a",
                      bCol: String = "id_b",
                      simCol: String = "cosine_sim"): DataFrame = {
    val sym = pairs
      .select(col(aCol).as("id"), col(bCol).as("p"), col(simCol).as("s"))
      .unionByName(pairs
        .select(col(bCol).as("id"), col(aCol).as("p"), col(simCol).as("s")))
    val best = sym.groupBy(col("id"))
      .agg(min(struct((-col("s")).as("ns"), col("p").as("p"))).as("b"))
      .select(col("id"), col("b.p").as("p"), (-col("b.ns")).as("s"))
    best.as("x")
      .join(best.as("y"),
        col("x.p") === col("y.id") && col("y.p") === col("x.id") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as(aCol), col("x.p").as(bCol), col("x.s").as(simCol))
  }
}
