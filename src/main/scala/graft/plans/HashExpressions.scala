package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (whole-stage-codegen) 56-bit md5 half-hashes of a string:
  * `struct<b1: long, b2: long>` where b1 = digest bytes 0..6 and
  * b2 = digest bytes 7..13, both read big-endian as unsigned 56-bit ints.
  *
  * Why a custom Expression: the composable form
  * `conv(substring(md5(x), 1, 14), 16, 10).cast("long")` pays for a 32-char
  * hex STRING render of the digest, a substring allocation, and `conv`'s
  * per-character base parse — then again for the second half. This hash is
  * evaluated once per token/shingle instance across the dedup stack
  * (MinHash bases, SimHash votes, count-min rows, sampling keys), i.e. it
  * sits on the same 100 TB inner loop as [[WordShingles]], so like that
  * expression it drops to a hand-written `doGenCode` (SURVEY.md §4.3
  * preference order (b)): one digest over the raw UTF-8 bytes, two longs
  * assembled directly from digest bytes, zero intermediate strings.
  *
  * Semantics — bit-identical to the hex-string form it replaces (and to
  * DuckDB's `('0x' || substring(md5(x), 1, 14))::BIGINT`, so every oracle
  * reproduces the values): hex chars 1..14 of md5 are exactly digest bytes
  * 0..6, chars 15..28 exactly bytes 7..13; both values are < 2^56, hence
  * non-negative longs. Null input yields null.
  */
case class Md5Halves(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("b1", LongType, nullable = false),
    StructField("b2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_halves requires a string argument, got ${other.sql}")
  }

  // MessageDigest instances are stateful and not thread-safe; one per
  // executor thread, reused across rows (getInstance per row is the hidden
  // cost of Spark's own DigestUtils-based md5).
  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The tight loop; also the codegen target (one virtual call per row). */
  def compute(s: UTF8String): InternalRow = {
    val md = digests.get()
    val d = md.digest(s.getBytes) // digest() resets the instance
    var b1 = 0L
    var b2 = 0L
    var i = 0
    while (i < 7) { b1 = (b1 << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 14) { b2 = (b2 << 8) | (d(i) & 0xffL); i += 1 }
    new GenericInternalRow(Array[Any](b1, b2))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Halves", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Halves =
    copy(child = newChild)

  override def prettyName: String = "md5_halves"
}

object HashExpressions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: `struct<b1, b2>` of 56-bit md5 halves. */
  def md5Halves(c: Column): Column =
    ColumnBridge.column(Md5Halves(ColumnBridge.expression(c)))

  /** First 56-bit half only (the `Dedup.hexHash` value). Codegen common-
    * subexpression elimination collapses sibling [[Md5Halves]] instances in
    * one projection, so pairing this with a `.getField("b2")` of another
    * call still digests once per row. */
  def md5Half56(c: Column): Column = md5Halves(c).getField("b1")

  /** Register `md5_halves(s)` for SQL use on a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_halves", exprs => Md5Halves(exprs.head), "built-in")
}
