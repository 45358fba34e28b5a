package graft.similarity

import graft.plans.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the compression layer that makes
  * billion-vector ANN memory-resident: each vector splits into `nSubspaces`
  * contiguous subvectors and every subvector is replaced by the id of its
  * nearest codeword, so the corpus stores `nSubspaces` small codes per
  * vector instead of `d` floats (64 dims × 4 B → 4 codes: a 64× cut at
  * byte codes; the ids here are longs for oracle parity, the compression
  * argument is unchanged).
  *
  * Query-time search is ADC (asymmetric distance computation): the query
  * stays UNquantized; per (query, subspace, codeword) a lookup table of
  * partial squared distances is built once — `nQueries × nSubspaces × K`
  * rows, broadcast-sized by construction — and every corpus vector's
  * distance is the sum of `nSubspaces` table hits on its codes. The 100 TB
  * plan shape: the raw vectors are read ONCE at encode time (a narrow
  * codegen argmin scan, zero exchanges — the [[graft.plans.NearestCentroid]]
  * path KMeans uses); at query time only the compact code table is
  * scanned, joined to the broadcast LUT on (subspace, code) — no raw
  * vector is touched, no shuffle of embeddings, and the per-query work is
  * a map-side-combined sum of `nSubspaces` doubles per candidate.
  *
  * Codewords are a deterministic sample of the corpus (`isCodeword`), the
  * same seeding convention as [[KMeans]] init and [[Similarity.ivfTopK]]
  * centroids — production would Lloyd-refine them per subspace (compose
  * with [[KMeans]]); the plan shape is identical either way. Everything is
  * reproducible: codeword ids assigned 1..K in vec_id order, argmin
  * tie-broken on (distance, codeword id), ADC ranked on the ROUNDED
  * distance (6 dp) with id tie-break.
  *
  * Compose with [[Similarity.ivfTopK]] for IVF-PQ: coarse cells prune the
  * candidate list, ADC scores the survivors — the two prunings multiply.
  */
object ProductQuantization {

  /** Deterministic codebook: codeword rows in vec_id order become ids
    * 1..K; entry (m)(i) = (cid, subvector of codeword i in subspace m).
    * Driver-collected and bounded (K·d doubles), like KMeans centroids. */
  private def codebook(vecs: DataFrame, idCol: String, embCol: String,
                       isCodeword: Column, nSubspaces: Int,
                       subDim: Int): IndexedSeq[Seq[(Long, Array[Double])]] = {
    val toDouble = transform(col(embCol), x => x.cast("double"))
    val seeds = vecs.filter(isCodeword)
      .select(col(idCol).cast("long"), toDouble)
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => ((i + 1).toLong, r.getSeq[Double](1).toArray) }
      .toSeq
    require(seeds.nonEmpty, "isCodeword selected no codeword rows")
    seeds.foreach { case (_, arr) =>
      require(arr.length >= nSubspaces * subDim,
        s"codeword shorter than nSubspaces*subDim = ${nSubspaces * subDim}")
    }
    (0 until nSubspaces).map { m =>
      seeds.map { case (cid, arr) =>
        (cid, arr.slice(m * subDim, (m + 1) * subDim))
      }
    }
  }

  /** PQ-encode the corpus: one row per (vector, subspace) —
    * (vec_id, m, code, sub_d2), `code` = nearest codeword id in subspace
    * `m`, `sub_d2` = its squared L2 distance rounded to 6 dp.
    *
    * One narrow scan: all `nSubspaces` argmins run inside a single
    * projection (each a native NearestCentroid over a `slice` of the
    * vector), then explode to the per-subspace rows — the raw embedding is
    * read once and never shuffled. */
  def encode(vecs: DataFrame, idCol: String, embCol: String,
             isCodeword: Column, nSubspaces: Int, subDim: Int): DataFrame = {
    val cb = codebook(vecs, idCol, embCol, isCodeword, nSubspaces, subDim)
    val toDouble = transform(col(embCol), x => x.cast("double"))
    val base = vecs.select(col(idCol).cast("long").as("vec_id"),
      toDouble.as("v"))
    val perSub = (0 until nSubspaces).map { m =>
      val best = VectorExpressions.nearestCentroid(
        slice(col("v"), m * subDim + 1, subDim),
        cb(m).map(_._1).toArray, cb(m).map(_._2).toArray)
      struct(lit(m.toLong).as("m"), best.getField("cid").as("code"),
        best.getField("d2").as("sub_d2"))
    }
    base
      .select(col("vec_id"), explode(array(perSub: _*)).as("c"))
      .select(col("vec_id"), col("c.m").as("m"), col("c.code").as("code"),
        round(col("c.sub_d2"), 6).as("sub_d2"))
  }

  /** The per-query partial-distance lookup table (query_id, lm, cid, pd2):
    * ||q_m − c_{m,cid}||² for every (subspace, codeword) — nQueries ×
    * nSubspaces × K rows, broadcast-sized by construction. UNrounded; only
    * the final ADC sum rounds (mirroring the oracle). */
  private def queryLut(vecs: DataFrame, idCol: String, embCol: String,
                       isQuery: Column,
                       cb: IndexedSeq[Seq[(Long, Array[Double])]],
                       nSubspaces: Int, subDim: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cbDf = (for {
      m <- 0 until nSubspaces
      (cid, sub) <- cb(m)
    } yield (m.toLong, cid, sub.toSeq)).toDF("lm", "cid", "c_sub")
    val toDouble = transform(col(embCol), x => x.cast("double"))
    vecs.filter(isQuery)
      .select(col(idCol).cast("long").as("query_id"), toDouble.as("qv"))
      .select(col("query_id"), explode(array((0 until nSubspaces).map { m =>
        struct(lit(m.toLong).as("lm"),
          slice(col("qv"), m * subDim + 1, subDim).as("q_sub"))
      }: _*)).as("s"))
      .select(col("query_id"), col("s.lm").as("lm"), col("s.q_sub").as("q_sub"))
      .join(broadcast(cbDf), Seq("lm"))
      .select(col("query_id"), col("lm"), col("cid"),
        aggregate(zip_with(col("q_sub"), col("c_sub"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("pd2"))
  }

  /** ADC top-k: every query (unquantized) against the PQ-encoded corpus.
    * Returns (query_id, neighbor_id, adc_d2, rank), rank 1..k per query by
    * ascending rounded ADC distance, id tie-break; the query row itself is
    * excluded like the other ANN entry points.
    *
    * Plan: codes ⋈ broadcast(LUT) on (subspace, code) → groupBy
    * (query, vector) sum — the only shuffle is the bounded per-pair
    * aggregation, map-side combined from nSubspaces rows; raw vectors
    * appear nowhere. */
  def adcTopK(vecs: DataFrame, idCol: String, embCol: String,
              isQuery: Column, isCodeword: Column,
              nSubspaces: Int, subDim: Int, k: Int): DataFrame = {
    val cb = codebook(vecs, idCol, embCol, isCodeword, nSubspaces, subDim)
    val codes = encode(vecs, idCol, embCol, isCodeword, nSubspaces, subDim)
      .select(col("vec_id"), col("m"), col("code"))
    val lut = queryLut(vecs, idCol, embCol, isQuery, cb, nSubspaces, subDim)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("adc_d2"), asc("neighbor_id"))
    codes
      .join(broadcast(lut),
        col("m") === col("lm") && col("code") === col("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(round(sum(col("pd2")), 6).as("adc_d2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ top-k — both prunings composed: the corpus coarse-quantizes
    * into cells around sampled centroid vectors ([[Similarity.ivfTopK]]'s
    * convention: max ROUNDED cosine, id tie-break), each query probes only
    * its `nProbe` nearest cells, and the survivors are scored by ADC over
    * their PQ codes. Candidate volume scales with corpus/cells × nProbe,
    * and each candidate costs `nSubspaces` lookup-table hits instead of a
    * d-dim dot product — the memory-resident billion-vector search shape.
    *
    * Plan: (cell_id ⋈ codes) is the inverted file WITH codes — built here
    * with one shuffle on vec_id, materialized/bucketed once in production —
    * scanned against a broadcast (probe × LUT) table on
    * (cell, subspace, code); never a cartesian, never a raw vector at
    * query time. Note: codes quantize the raw vectors — the residual form
    * (classic IVFADC, what production accuracy wants) is
    * [[ivfPqResidualTopK]]; this raw-code variant stays as the cheaper
    * baseline and the comparison point. */
  /** IVF-PQ with RESIDUAL coding — classic IVFADC (Jégou TPAMI'11 §IV-A):
    * one product quantizer SHARED across cells, trained on and applied to
    * the residual r = v − centroid(cell(v)) instead of the raw vector.
    * Residuals concentrate around the origin, so the same code budget
    * spends its resolution on the part of the vector the coarse quantizer
    * did not explain — the accuracy refinement production IVFADC uses.
    *
    * Plan shape — the corpus side is ONE NARROW PASS, no embedding ever
    * shuffles: cell assignment is an in-row rounded-cosine argmax over the
    * driver-collected centroid matrix (K codegen'd vec_dot terms +
    * `array_min` on (−cs, cell) structs — same convention as
    * [[Similarity.ivfTopK]]: max rounded cosine, id tie-break), the
    * residual is in-row arithmetic against the same broadcast matrix, and
    * the per-subspace codes are native NearestCentroid argmins over the
    * residual codebook. Query-side probes are the bounded query slice
    * (top-`nProbe` cells via the same in-row score array), and scoring is
    * the inverted-file-with-codes scan against a broadcast probe×LUT table
    * on (cell, subspace, code) — identical to [[ivfPqTopK]]'s final join.
    *
    * The residual codebook is the codeword rows' residuals, computed IN
    * SPARK by the same expressions the corpus uses (so engine/oracle float
    * parity is by construction) and collected bounded (K·d doubles, the
    * [[codebook]] contract). `isCodeword` must select rows DISJOINT from
    * `isCentroid`: a centroid's residual is the zero vector, so seeding
    * the codebook from centroid rows would collapse it. */
  def ivfPqResidualTopK(vecs: DataFrame, idCol: String, embCol: String,
                        isQuery: Column, isCentroid: Column, isCodeword: Column,
                        nSubspaces: Int, subDim: Int, k: Int,
                        nProbe: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val toDouble = transform(col(embCol), x => x.cast("double"))
    // in-row cell argmax + residual against the driver-collected centroid
    // matrix (CellAssignment): one narrow corpus pass, zero exchanges
    val cells = CellAssignment.collect(vecs, idCol, embCol, isCentroid)
    val centMat = cells.matLit
    val base = vecs.select(col(idCol).cast("long").as("vid"), toDouble.as("v"),
        isQuery.as("is_q"), isCodeword.as("is_cw"))
      .withColumn("v_norm", sqrt(VectorExpressions.vecDot(col("v"), col("v"))))
    val withCell = base
      .withColumn("best", CellAssignment.assignedCell(cells, col("v")))
      .withColumn("cell_id", col("best").getField("cid"))
      .withColumn("r", zip_with(col("v"),
        element_at(centMat, col("best").getField("idx")), (a, b) => a - b))
    // shared residual codebook: codeword residuals (Spark-computed by the
    // exact expressions above), collected bounded, ids 1..K in vec_id order
    val rcwRows = withCell.filter(col("is_cw"))
      .select(col("vid"), col("r"))
      .collect().sortBy(_.getLong(0)).zipWithIndex
      .map { case (row, i) => ((i + 1).toLong, row.getSeq[Double](1).toArray) }
      .toSeq
    require(rcwRows.nonEmpty, "isCodeword selected no codeword rows")
    require(rcwRows.forall(_._2.length >= nSubspaces * subDim),
      s"codeword shorter than nSubspaces*subDim = ${nSubspaces * subDim}")
    val rcb = (0 until nSubspaces).map { m =>
      rcwRows.map { case (cid, a) => (cid, a.slice(m * subDim, (m + 1) * subDim)) }
    }
    // the inverted file with residual codes, built narrowly: all nSubspaces
    // argmins in one projection, then explode — (vid, cell_id, m, code)
    val perSub = (0 until nSubspaces).map { m =>
      val best = VectorExpressions.nearestCentroid(
        slice(col("r"), m * subDim + 1, subDim),
        rcb(m).map(_._1).toArray, rcb(m).map(_._2).toArray)
      struct(lit(m.toLong).as("m"), best.getField("cid").as("code"))
    }
    val codes = withCell
      .select(col("vid"), col("cell_id"), explode(array(perSub: _*)).as("c"))
      .select(col("vid"), col("cell_id"), col("c.m").as("m"),
        col("c.code").as("code"))
    // query probes (bounded slice): top-nProbe cells per query, in-row
    val probes = base.filter(col("is_q"))
      .withColumn("p",
        CellAssignment.probeCells(cells, col("v"), nProbe))
      .select(col("vid").as("query_id"), col("v").as("qv"),
        col("p").getField("cid").as("p_cell"),
        col("p").getField("idx").as("p_idx"))
    val rcbDf = (for {
      m <- 0 until nSubspaces
      (cid, sub) <- rcb(m)
    } yield (m.toLong, cid, sub.toSeq)).toDF("lm", "cid", "c_sub")
    // probe×LUT: per (query, probed cell, subspace, codeword) the partial
    // distance of the PER-CELL query residual — broadcast-sized
    // (nQueries × nProbe × nSubspaces × K)
    val lut = probes
      .withColumn("qr", zip_with(col("qv"),
        element_at(centMat, col("p_idx")), (a, b) => a - b))
      .select(col("query_id"), col("p_cell"),
        explode(array((0 until nSubspaces).map { m =>
          struct(lit(m.toLong).as("lm"),
            slice(col("qr"), m * subDim + 1, subDim).as("q_sub"))
        }: _*)).as("s"))
      .select(col("query_id"), col("p_cell"), col("s.lm").as("lm"),
        col("s.q_sub").as("q_sub"))
      .join(broadcast(rcbDf), Seq("lm"))
      .select(col("query_id"), col("p_cell"), col("lm"), col("cid"),
        aggregate(zip_with(col("q_sub"), col("c_sub"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("pd2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("adc_d2"), asc("neighbor_id"))
    codes
      .join(broadcast(lut),
        col("cell_id") === col("p_cell") && col("m") === col("lm") &&
          col("code") === col("cid"))
      .filter(col("vid") =!= col("query_id"))
      .groupBy(col("query_id"), col("vid").as("neighbor_id"))
      .agg(round(sum(col("pd2")), 6).as("adc_d2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  def ivfPqTopK(vecs: DataFrame, idCol: String, embCol: String,
                isQuery: Column, isCentroid: Column, isCodeword: Column,
                nSubspaces: Int, subDim: Int, k: Int, nProbe: Int): DataFrame = {
    val toDouble = transform(col(embCol), x => x.cast("double"))
    def l2norm(c: Column): Column =
      sqrt(VectorExpressions.vecDot(c, c))
    // in-row assignment/probes against the driver-collected centroid
    // matrix (CellAssignment, the ivfTopK convention): no n×K crossJoin
    // rows, no per-vector window — the corpus id→cell table falls out of
    // one narrow scan
    val cells = CellAssignment.collect(vecs, idCol, embCol, isCentroid)
    val base = vecs.select(col(idCol).cast("long").as("vid"),
      toDouble.as("v_emb"), l2norm(toDouble).as("v_norm"),
      isQuery.as("is_q"))
    val assigned = base
      .withColumn("cell_id",
        CellAssignment.assignedCell(cells, col("v_emb")).getField("cid"))
      .select(col("vid"), col("cell_id"))
    val probes = base.filter(col("is_q"))
      .withColumn("p",
        CellAssignment.probeCells(cells, col("v_emb"), nProbe))
      .select(col("vid").as("query_id"), col("p").getField("cid").as("p_cell"))
    val cb = codebook(vecs, idCol, embCol, isCodeword, nSubspaces, subDim)
    val codes = encode(vecs, idCol, embCol, isCodeword, nSubspaces, subDim)
      .select(col("vec_id").as("vid"), col("m"), col("code"))
    // the inverted file with codes: (cell_id, vid, m, code)
    val cellCodes = assigned.join(codes, Seq("vid"))
    // probe × LUT: (query_id, p_cell, lm, cid, pd2) — broadcast-sized
    val probeLut = probes.join(
      queryLut(vecs, idCol, embCol, isQuery, cb, nSubspaces, subDim),
      Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("adc_d2"), asc("neighbor_id"))
    cellCodes
      .join(broadcast(probeLut),
        col("cell_id") === col("p_cell") && col("m") === col("lm") &&
          col("code") === col("cid"))
      .filter(col("vid") =!= col("query_id"))
      .groupBy(col("query_id"), col("vid").as("neighbor_id"))
      .agg(round(sum(col("pd2")), 6).as("adc_d2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
