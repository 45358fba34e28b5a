package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native (whole-stage-codegen) Bloom-filter membership probe.
  *
  * Why a custom Expression: the composable form is `numHashes` chained
  * `element_at`/`shiftright`/`bitwiseAND` trees over an array literal —
  * a wide expression that Janino compiles slowly and that re-derives the
  * word index per probe. The probe is the inner loop of incremental
  * dedup (every new document, every hash), so like DotProduct and
  * WordShingles it drops to a hand-written Catalyst Expression with
  * `doGenCode` (SURVEY.md §4.3 preference order (b)): the bit array rides
  * along as a codegen reference object and membership is one tight loop.
  *
  * Children are the two Kirsch-Mitzenmacher base hashes g1, g2 (LongType,
  * each already folded into [0, 2^31) by [[graft.dedup.BloomDedup.hashPair]]),
  * so `g1 + i*g2` cannot overflow for i < numHashes. Bit positions are
  * `(g1 + i*g2) % numBits` — the IDENTICAL formula the insert side
  * ([[graft.dedup.BloomDedup.BloomAgg]]) uses, which is what guarantees
  * no false negatives.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             bits: Array[Long], numBits: Int, numHashes: Int)
    extends BinaryExpression {
  require(numBits > 0 && numHashes > 0 && bits.length == (numBits + 63) / 64,
    s"bit array must hold exactly numBits=$numBits bits")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (bigint, bigint) hashes, got (${l.sql}, ${r.sql})")
    }

  /** The tight loop; also the codegen target (one virtual call per row). */
  def compute(g1: Long, g2: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val pos = ((g1 + i * g2) % numBits).toInt // g < 2^31: no overflow
      if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(g1: Any, g2: Any): Any =
    compute(g1.asInstanceOf[Long], g2.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this)
    nullSafeCodeGen(ctx, ev, (g1, g2) => s"${ev.value} = $ref.compute($g1, $g2);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomExpression {
  /** Column API for the native Bloom probe. */
  def bloomMightContain(g1: Column, g2: Column, bits: Array[Long],
                        numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(g1), ColumnBridge.expression(g2),
      bits, numBits, numHashes))
}
