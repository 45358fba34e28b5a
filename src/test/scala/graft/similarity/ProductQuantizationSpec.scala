package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {

  // 6 vectors of dim 4; subspaces = 2 × 2 dims. Codewords: ids 1 and 4.
  private def vecs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(0.5f, 0f, 10f, 9f)),
      (3L, Seq(4f, 4f, 0f, 0f)),
      (4L, Seq(4f, 4f, 0f, 1f)),
      (5L, Seq(0f, 1f, 0.5f, 0.5f)),
      (6L, Seq(3f, 4f, 9f, 9f))
    ).toDF("vec_id", "embedding")
  }

  private val isCw = col("vec_id").isin(1L, 4L)

  // the Scala reference: codeword 1 → cid 1, codeword 4 → cid 2
  private val cw = Map(1L -> Array(0.0, 0.0, 10.0, 10.0),
    2L -> Array(4.0, 4.0, 0.0, 1.0))
  private def subD2(v: Array[Double], c: Array[Double], m: Int): Double =
    (m * 2 until (m + 1) * 2).map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
  private val all = Map(
    1L -> Array(0.0, 0.0, 10.0, 10.0), 2L -> Array(0.5, 0.0, 10.0, 9.0),
    3L -> Array(4.0, 4.0, 0.0, 0.0), 4L -> Array(4.0, 4.0, 0.0, 1.0),
    5L -> Array(0.0, 1.0, 0.5, 0.5), 6L -> Array(3.0, 4.0, 9.0, 9.0))
  private def refCode(id: Long, m: Int): (Long, Double) =
    cw.toSeq.map { case (cid, c) => (cid, subD2(all(id), c, m)) }
      .minBy { case (cid, d2) => (d2, cid) }

  test("encode: one row per (vector, subspace); argmin matches reference") {
    val out = ProductQuantization.encode(vecs, "vec_id", "embedding",
      isCw, nSubspaces = 2, subDim = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.size == 12)
    for (id <- 1L to 6L; m <- 0 until 2) {
      val (cid, d2) = refCode(id, m)
      val (gotCid, gotD2) = out((id, m.toLong))
      assert(gotCid == cid, s"vec $id sub $m: got code $gotCid want $cid")
      assert(math.abs(gotD2 - d2) < 1e-6, s"vec $id sub $m: d2 $gotD2 want $d2")
    }
  }

  test("codeword vectors encode to themselves with zero error") {
    val out = ProductQuantization.encode(vecs, "vec_id", "embedding",
      isCw, 2, 2)
      .filter(col("vec_id").isin(1L, 4L)).collect()
    out.foreach { r =>
      val expect = if (r.getLong(0) == 1L) 1L else 2L
      assert(r.getLong(2) == expect && r.getDouble(3) == 0.0,
        s"codeword row $r should self-code at distance 0")
    }
  }

  test("adcTopK matches the reference ADC distances; self excluded; k rows") {
    val got = ProductQuantization.adcTopK(vecs, "vec_id", "embedding",
      isQuery = col("vec_id").isin(2L, 6L), isCodeword = isCw,
      nSubspaces = 2, subDim = 2, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // reference: adc(q, x) = Σ_m ||q_m − cw[code(x, m)]_m||², rounded 6 dp
    def adc(q: Long, x: Long): Double = {
      val direct = (0 until 2).map { m =>
        val cid = refCode(x, m)._1
        (m * 2 until (m + 1) * 2).map(i => (all(q)(i) - cw(cid)(i)) *
          (all(q)(i) - cw(cid)(i))).sum
      }.sum
      math.rint(direct * 1e6) / 1e6
    }
    for (q <- Seq(2L, 6L)) {
      val mine = got.filter(_._1 == q)
      assert(mine.length == 3, s"query $q should return k=3 rows")
      assert(!mine.exists(_._2 == q), s"query $q must exclude itself")
      assert(mine.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L))
      val want = all.keys.filter(_ != q).toSeq
        .map(x => (x, adc(q, x))).sortBy { case (x, d) => (d, x) }.take(3)
      assert(mine.sortBy(_._4).map(t => (t._2, t._3)).toSeq == want,
        s"query $q: got ${mine.toSeq} want $want")
    }
  }

  test("ivfPqTopK only scores candidates from probed cells (ADC unchanged)") {
    // centroids 1 and 4 define two cells; with nProbe = 1 each query scores
    // only its own cell's members — a candidate from the other cell may be
    // ADC-closer yet must not appear
    val got = ProductQuantization.ivfPqTopK(vecs, "vec_id", "embedding",
      isQuery = col("vec_id").isin(2L, 6L), isCentroid = isCw,
      isCodeword = isCw, nSubspaces = 2, subDim = 2, k = 5, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // reference cell assignment: max rounded cosine to centroids 1/4
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.rint(dp / (na * nb) * 1e6) / 1e6
    }
    val cells = all.map { case (id, v) =>
      id -> Seq((1L, cos(v, all(1L))), (4L, cos(v, all(4L))))
        .maxBy { case (cid, c) => (c, -cid) }._1
    }
    for ((q, neighbors) <- got) {
      assert(!neighbors.contains(q))
      neighbors.foreach { n =>
        assert(cells(n) == cells(q),
          s"query $q (cell ${cells(q)}) scored $n from cell ${cells(n)}")
      }
    }
    // with nProbe covering all cells, IVF-PQ degrades to plain ADC
    val full = ProductQuantization.ivfPqTopK(vecs, "vec_id", "embedding",
      isQuery = col("vec_id").isin(2L, 6L), isCentroid = isCw,
      isCodeword = isCw, nSubspaces = 2, subDim = 2, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val adc = ProductQuantization.adcTopK(vecs, "vec_id", "embedding",
      isQuery = col("vec_id").isin(2L, 6L), isCodeword = isCw,
      nSubspaces = 2, subDim = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(full == adc, s"nProbe=all must equal plain ADC: $full vs $adc")
  }

  test("isCodeword selecting nothing is rejected") {
    intercept[IllegalArgumentException] {
      ProductQuantization.encode(vecs, "vec_id", "embedding", lit(false), 2, 2)
    }
  }
}
