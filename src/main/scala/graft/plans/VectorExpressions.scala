package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native (whole-stage-codegen) dot product over two numeric arrays.
  *
  * Why a custom Expression: the composable form
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates an intermediate array
  * and evaluates lambda closures per element — higher-order functions are
  * interpreted, not codegen'd. For similarity search the dot product IS the
  * inner loop (corpus × queries × dims evaluations), so this is the one
  * place the engine drops to a hand-written Catalyst Expression with
  * `doGenCode` (SURVEY.md §4.3 preference order (b)).
  *
  * Semantics: elements cast to double, summed in ascending index order —
  * bit-identical to the sequential `aggregate` fold it replaces (oracle
  * parity preserved). Null if either array is null; arrays must have equal
  * length.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VectorExpressions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API for the native dot product. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `vec_dot` for SQL use on a session
    * (`SELECT vec_dot(embedding, embedding) FROM ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}

/** SparkSessionExtensions hook — the (c)-level registration path
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) so `vec_dot` is
  * available in every session of a cluster without code on the driver. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
