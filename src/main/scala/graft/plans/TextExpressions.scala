package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (whole-stage-codegen) word w-shingles of a token array.
  *
  * Why a custom Expression: the composable form
  * `transform(sequence(1, n-w+1), i => array_join(slice(toks, i, w), " "))`
  * is a higher-order function — interpreted per ELEMENT, never codegen'd —
  * and slice/array_join allocate an intermediate array per shingle. Shingle
  * construction is the inner loop of every n-gram operator in the engine
  * (MinHash signatures, LSH banding, Jaccard, decontamination, repetition
  * filters), the dominant scan cost on a 100 TB corpus, so like DotProduct
  * it drops to a hand-written Catalyst Expression with `doGenCode`
  * (SURVEY.md §4.3 preference order (b)). Measured ~10× over the HOF form
  * at sf0.1.
  *
  * Semantics — bit-identical to the HOF form it replaces (DuckDB oracles
  * interpolate the same strings):
  *  - `max(n - w + 1, 1)` shingles: docs shorter than w tokens yield ONE
  *    truncated shingle, never zero (keeps short docs dedupable);
  *  - shingle i = tokens [i, min(i+w, n)) joined by a single space;
  *  - an empty token array yields one empty-string shingle;
  *  - null ELEMENTS are skipped in the join (array_join's default);
  *  - a null token ARRAY yields null.
  */
case class WordShingles(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires an array<string> argument, got ${other.sql}")
  }

  private val space = UTF8String.fromString(" ")

  /** The tight loop; also the codegen target (one virtual call per row). */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val count = math.max(n - (width - 1), 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + width, n)
      val parts = new Array[UTF8String](math.max(end - i, 0))
      var j = i
      while (j < end) {
        parts(j - i) = toks.getUTF8String(j) // null elements skipped by concatWs
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object TextExpressions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API for native word shingles. */
  def wordShingles(toks: Column, width: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(toks), width))

  /** Register `word_shingles(toks, w)` for SQL use on a session. Width must
    * be a foldable integer (it shapes the generated code). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), foldToInt(exprs(1))), "built-in")

  private[plans] def foldToInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"word_shingles width must be a foldable integer literal, got $other")
  }
}
