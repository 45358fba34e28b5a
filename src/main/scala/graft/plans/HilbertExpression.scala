package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve index: the iterative xy→d walk (one rotation step
  * per bit, most significant first) as a single tight JVM loop per row.
  *
  * Why native: the same walk unrolled as Catalyst column arithmetic
  * DOUBLES its expression tree per step (each step's x and y reference
  * both predecessors), so an order-8 key is a ~2^8-node expression —
  * catastrophic to optimize and execute (measured ~100 s for 5000 rows at
  * sf0.1). The loop form is O(bits) per row and one virtual call in
  * whole-stage codegen, the [[NearestCentroid]] convention. The oracle
  * reproduces the walk as per-step SQL CTEs (linear, never nested). */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires (bigint, bigint) coordinates, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  /** The tight loop; also the codegen target. */
  def compute(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertIndex", this)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

object HilbertExpression {
  import org.apache.spark.sql.graft.ColumnBridge

  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
