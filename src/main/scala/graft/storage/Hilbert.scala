package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve data clustering — the locality upgrade over [[ZOrder]]:
  * the Hilbert curve visits every cell of the 2^bits × 2^bits grid with
  * CONSECUTIVE indices always grid-adjacent (|Δx| + |Δy| = 1), so it has
  * none of the Morton curve's long diagonal jumps and strictly better
  * worst-case locality for box queries — which is why the serious
  * lakehouse layouts offer it next to Z-order. The price is a
  * rotation-aware index computation instead of plain bit interleave.
  *
  * The index is the classic iterative xy→d walk (one step per bit, most
  * significant first; each step adds the quadrant's sub-square count and
  * rotates/reflects the frame), UNROLLED into pure column arithmetic —
  * `bits` rounds of shift/mask/CASE, no UDF, whole-stage codegen'd, and
  * reproducible as the same unrolled steps in SQL (the oracle). Same
  * write-time story as Z-order: [[cluster]] range-partitions by the
  * index and sorts within partitions, so every output file covers a
  * compact curve segment and row-group min/max stats stay selective on
  * both dimensions. */
object Hilbert {

  /** Hilbert index of (x, y) on the order-`bits` curve. Both inputs must
    * lie in [0, 2^bits). Backed by the native codegen
    * [[graft.plans.HilbertIndex]] — the equivalent unrolled column
    * arithmetic doubles its expression tree per bit (each step's x and y
    * reference both predecessors), a ~2^bits-node plan that took ~100 s
    * for 5000 rows; the native loop is O(bits) per row. */
  def hValue(x: Column, y: Column, bits: Int = 16): Column =
    graft.plans.HilbertExpression.hilbertIndex(
      x.cast("long"), y.cast("long"), bits)

  /** Cluster `df` for (x, y) locality along the Hilbert curve:
    * range-partition into `numPartitions` by index and sort within each
    * partition — the write-time layout pass, interface-identical to
    * [[ZOrder.cluster]]. */
  def cluster(df: DataFrame, xCol: String, yCol: String, numPartitions: Int,
              bits: Int = 16): DataFrame = {
    val h = hValue(col(xCol), col(yCol), bits).as("__h")
    df.withColumn("__h", h)
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }
}
