package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — the bounded-memory frequency
  * summary for corpora where an exact per-token count table is itself too
  * big to hold: `depth × width` counters (kilobytes) estimate any token's
  * frequency with one-sided error (estimate ≥ truth, overshoot bounded by
  * collisions ≈ N/width per row, min over rows).
  *
  * Engine shape: the sketch is a typed `Aggregator` whose buffer is the
  * flat counter array — commutative and associative (elementwise +), so
  * Spark combines partial sketches MAP-SIDE and the shuffle carries one
  * `depth·width` array per partition, never the token stream. The finished
  * sketch is a driver-side constant (32 KB at the defaults) probed by pure
  * column expressions.
  *
  * Determinism (and hence oracle-ability): counter rows use the same
  * Kirsch-Mitzenmacher double hashing as the rest of the engine — row i
  * buckets on `(b1 + i·b2) mod width` over the two independent 56-bit md5
  * halves of the token ([[graft.dedup.Dedup.hexHash]] family), which DuckDB
  * reproduces bit-for-bit. Counts are sums, so the sketch is independent of
  * partitioning and merge order. No overflow: b < 2^56, i < depth keeps
  * b1 + i·b2 < 2^63 for depth ≤ 64.
  */
object CountMinSketch {

  /** Typed CMS aggregator: buffer/output is the flat depth×width counter
    * array, merged by elementwise addition (map-side combinable). */
  final class CmsAgg(depth: Int, width: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(depth > 0 && depth <= 64 && width > 0)

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      val (b1, b2) = in
      var i = 0
      while (i < depth) {
        b(i * width + ((b1 + i * b2) % width).toInt) += 1L
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** The two 56-bit md5-half hashes of a token (the engine-portable pair
    * every sketch position derives from). One codegen digest per row —
    * sibling halves collapse via common-subexpression elimination. */
  def hashPair(tok: Column): (Column, Column) = {
    val h = graft.plans.HashExpressions.md5Halves(tok)
    (h.getField("b1"), h.getField("b2"))
  }

  /** Aggregate a token column into the flat counter array (one driver row —
    * the "sketch build" job; kilobytes at any corpus size). */
  def build(tokens: DataFrame, tokCol: String,
            depth: Int, width: Int): Array[Long] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val (b1, b2) = hashPair(col(tokCol))
    tokens.select(b1.as("b1"), b2.as("b2")).as[(Long, Long)]
      .select(new CmsAgg(depth, width).toColumn)
      .collect().headOption.getOrElse(new Array[Long](depth * width))
  }

  /** Point estimate for a token column against a built sketch: min over the
    * depth rows of that row's counter — pure column expressions over the
    * broadcast-sized literal array. (A CMS is kilobytes-to-megabytes by
    * design; if an unusually wide sketch ever neared the expression-literal
    * comfort zone, ship it as a broadcast variable exactly like
    * `BloomMightContainBroadcast` does for large Bloom filters.) */
  def estimate(cms: Array[Long], depth: Int, width: Int)(tok: Column): Column = {
    val (b1, b2) = hashPair(tok)
    // ONE Literal node shared by all depth rows: the expression tree (and
    // each serialized task closure) carries a single copy of the counter
    // array, not depth copies
    val cmsLit = lit(cms)
    (0 until depth)
      .map(i => element_at(cmsLit,
        (lit(i * width) + pmod(b1 + lit(i.toLong) * b2, lit(width))).cast("int") + 1))
      .reduce(least(_, _))
  }

  /** Heavy hitters by sketch estimate: the top `k` distinct tokens ranked
    * by estimated count — `(token, est_count, rank)`.
    *
    * Plan: one pass builds the sketch (map-side combined), one distinct
    * over tokens probes it, and the head is a TakeOrdered (never a full
    * sort). The exact-count alternative (`e_vocabulary`) shuffles the whole
    * distinct vocabulary with exact counts; this keeps per-executor state
    * at depth·width counters no matter how large the vocabulary grows. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int,
                   depth: Int = 4, width: Int = 256): DataFrame = {
    val toks = docs
      .select(explode(
        graft.functions.TextAnalysis.unicodeTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val cms = build(toks, "token", depth, width)
    toks.distinct()
      .withColumn("est_count", estimate(cms, depth, width)(col("token")))
      .orderBy(col("est_count").desc, col("token").asc)
      .limit(k)
      .withColumn("rank",
        // k-row post-limit frame: constant partition key = same
        // single-partition run without the unpartitioned-window warning
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0))
          .orderBy(col("est_count").desc, col("token").asc)).cast("long"))
  }
}
