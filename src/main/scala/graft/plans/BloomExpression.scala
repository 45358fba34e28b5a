package graft.plans

import org.apache.spark.broadcast.Broadcast
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

/** [[BloomMightContain]] with the bit array shipped as a BROADCAST VARIABLE
  * instead of a serialized expression constant.
  *
  * The literal form embeds `bits` in the expression tree, which rides the
  * task closure to every task — fine to ~2^27 bits (16 MiB), ruinous past
  * it (every task re-ships and re-deserializes the array). Here the
  * expression carries only the Broadcast HANDLE; executors fetch the blocks
  * once via the torrent broadcast and every task on the executor shares the
  * same in-memory array. Same probe loop, same codegen shape (the handle is
  * a codegen reference object), identical semantics — so filters sized for
  * ~10^9-key corpora keep the driver-literal path's performance profile. */
case class BloomMightContainBroadcast(left: Expression, right: Expression,
                                      bitsBc: Broadcast[Array[Long]],
                                      numBits: Int, numHashes: Int)
    extends BinaryExpression {
  require(numBits > 0 && numHashes > 0, "need positive numBits and numHashes")

  // resolved once per executor JVM (Broadcast.value caches internally; the
  // lazy val avoids even that lookup in the per-row loop)
  @transient private lazy val bits: Array[Long] = bitsBc.value

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_bc requires (bigint, bigint) hashes, got (${l.sql}, ${r.sql})")
    }

  /** Identical loop to [[BloomMightContain.compute]] — the no-false-negative
    * guarantee rests on insert and probe sharing the position formula. */
  def compute(g1: Long, g2: Long): Boolean = {
    val b = bits
    var i = 0
    while (i < numHashes) {
      val pos = ((g1 + i * g2) % numBits).toInt // g < 2^31: no overflow
      if ((b(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(g1: Any, g2: Any): Any =
    compute(g1.asInstanceOf[Long], g2.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbeBc", this)
    nullSafeCodeGen(ctx, ev, (g1, g2) => s"${ev.value} = $ref.compute($g1, $g2);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainBroadcast =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain_bc"
}

object BloomExpression {
  /** Column API for the native Bloom probe. */
  def bloomMightContain(g1: Column, g2: Column, bits: Array[Long],
                        numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(g1), ColumnBridge.expression(g2),
      bits, numBits, numHashes))

  /** Column API for the broadcast-variable Bloom probe (large filters). */
  def bloomMightContainBroadcast(g1: Column, g2: Column,
                                 bitsBc: Broadcast[Array[Long]],
                                 numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContainBroadcast(
      ColumnBridge.expression(g1), ColumnBridge.expression(g2),
      bitsBc, numBits, numHashes))
}
