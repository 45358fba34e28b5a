package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering — the lakehouse layout
  * technique for multi-dimensional locality: interleaving the bits of two
  * scan dimensions makes rows close in EITHER dimension land close in the
  * one-dimensional sort order, so range-partitioned + min/max-indexed
  * storage prunes well for predicates on x, on y, and on (x, y) boxes
  * simultaneously — where a plain sort on x serves x-slices but degrades
  * y-slices to full scans.
  *
  * At 100 TB this is a WRITE-time decision: [[cluster]] range-partitions
  * and locally sorts by the z-value, so each output file covers a compact
  * z-range and parquet row-group min/max stats on the original columns
  * become selective for both dimensions. The z-value itself is pure
  * codegen-friendly column arithmetic (shift/mask/add over disjoint bits
  * — no UDF). */
object ZOrder {

  /** Bit-interleaved z-value of N non-negative ints: bit i of dimension
    * j lands at position N·i + j. Every input must fit in `bits` bits
    * (values in [0, 2^bits)), and the interleaved width N·bits must fit
    * a long. Pure shift/mask/add column arithmetic — N·bits addends,
    * fully inside whole-stage codegen. */
  def zValueN(dims: Seq[Column], bits: Int = 16): Column = {
    val n = dims.length
    require(n >= 1, "z-order needs at least one dimension")
    require(bits >= 1 && bits * n <= 63,
      s"interleaved width $n x $bits bits must fit a signed long")
    (for { i <- 0 until bits; (c, j) <- dims.zipWithIndex } yield
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) *
        lit(1L << (n * i + j))
    ).reduce(_ + _)
  }

  /** Bit-interleaved z-value of two non-negative ints: bit i of `x` lands
    * at position 2i, bit i of `y` at 2i+1. Both inputs must fit in `bits`
    * bits (values in [0, 2^bits)). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** Cluster `df` for locality across ANY number of dimensions:
    * range-partition into `numPartitions` by the interleaved z-value and
    * sort within each partition, the standard write-time layout pass
    * (`...write.parquet` after this puts a compact z-range in every
    * file, so per-file min/max stats become selective on every
    * clustered column simultaneously). */
  def clusterN(df: DataFrame, dims: Seq[String], numPartitions: Int,
               bits: Int = 16): DataFrame = {
    val z = zValueN(dims.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** [[clusterN]] at the common 2-d case. */
  def cluster(df: DataFrame, xCol: String, yCol: String, numPartitions: Int,
              bits: Int = 16): DataFrame =
    clusterN(df, Seq(xCol, yCol), numPartitions, bits)
}
