package graft.similarity

import graft.plans.VectorExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection — the dimensionality-reduction
  * layer in front of dense retrieval: project d-dim embeddings to k ≪ d
  * dims with a ±1 sign matrix (Achlioptas' database-friendly JL variant:
  * ±1 entries preserve pairwise distances within (1±ε) like Gaussian
  * entries do, and cost one add/sub per term, no multiply).
  *
  * The sign matrix is DERIVED, not sampled: entry (row r, dim j) is the
  * parity of the portable 56-bit md5 hash of `"salt|j|r"` — the same hash
  * family as every sampler in this engine, so the projection is a pure
  * function of (dims, k, salt), identical on any engine/cluster size, and
  * the DuckDB oracle rebuilds the exact matrix in SQL. No RNG, no state to
  * ship: two integers and a salt ARE the matrix.
  *
  * Scale shape: [[projected]] is k codegen vec_dot terms against literal
  * sign rows — ONE narrow scan of the embedding column, no shuffle, no
  * UDF, nothing driver-side but the k×d literal itself. Downstream ops
  * (brute-force or banded cosine, k-means, PQ) run on k-dim arrays — a
  * d/k bandwidth cut on every exchange they make.
  */
object RandomProjection {

  /** Driver-side 56-bit md5-half — bit-identical to [[graft.plans.Md5Halves]]
    * / `Dedup.hexHash` / DuckDB `('0x' || substring(md5(x), 1, 14))::BIGINT`
    * (first 7 digest bytes, big-endian). */
  private[graft] def hexHash56(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 7).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  /** The k×dims ±1 sign matrix (row-major). */
  def signMatrix(dims: Int, k: Int, salt: String = "rp"): Array[Array[Double]] =
    Array.tabulate(k)(r => Array.tabulate(dims)(j =>
      if (hexHash56(s"$salt|$j|$r") % 2 == 0) 1.0 else -1.0))

  /** The k-dim projection of `embCol`. `embCol` must already be
    * `array<double>` — stage the float→double cast in ONE aliased
    * projection before this call, or the cast subtree duplicates into all
    * k dot terms (the whole-stage-codegen blow-up the perceptual hash hit). */
  def projected(embCol: Column, dims: Int, k: Int,
                salt: String = "rp"): Column = {
    require(dims >= 1 && k >= 1, "dims and k must be >= 1")
    val m = signMatrix(dims, k, salt)
    array(m.map(row =>
      VectorExpressions.vecDot(embCol, typedlit(row.toSeq))): _*)
  }
}
