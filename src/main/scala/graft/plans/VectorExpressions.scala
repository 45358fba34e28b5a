package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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
  * Semantics: elements widened to double, summed in ascending index order —
  * bit-identical to the sequential `aggregate` fold it replaces (oracle
  * parity preserved). Null if either array is null, and null if any ELEMENT
  * touched is null (SQL convention: an incomplete input yields NULL, never a
  * silently-zeroed sum; the element null checks are emitted only when the
  * array type says `containsNull`, so non-null embedding columns keep the
  * branch-free inner loop). Typed: inputs must be two `array<float>` or two
  * `array<double>` columns (anything else is an AnalysisException, not
  * silent garbage), and a length mismatch raises at execution — the
  * documented equal-length contract is enforced, never silently truncated.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Reject anything but a matched pair of float/double arrays at ANALYSIS
    * time: `getFloat` on an `array<double>` would read garbage bytes, and a
    * session-registered SQL function must fail loudly, not numerically. */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && (l == FloatType || l == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<float> or two array<double> arguments, " +
            s"got ${l.sql} and ${r.sql}")
    }

  private def elementType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType // unresolved input; checkInputDataTypes rejects it
  }

  /** Whether either input array may carry null ELEMENTS (drives both the
    * nullability of the result and whether the loops emit null checks). */
  private def elementsMayBeNull: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }

  override def nullable: Boolean =
    left.nullable || right.nullable || elementsMayBeNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"vec_dot: array length mismatch ($n vs ${y.numElements()})")
    }
    val isFloat = elementType == FloatType
    val checkNulls = elementsMayBeNull
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc +=
        (if (isFloat) x.getFloat(i).toDouble * y.getFloat(i).toDouble
         else x.getDouble(i) * y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // element getter resolved once at codegen time from the checked type
      val get = if (elementType == FloatType) "getFloat" else "getDouble"
      // null-element guard emitted ONLY for containsNull array types: the
      // hot path over non-null embeddings stays a branch-free fused loop
      val nullGuard =
        if (elementsMayBeNull)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += ((double) $a.$get($i)) * ((double) $b.$get($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Native argmin-over-centroids: `(cid, d2)` of the nearest centroid to a
  * vector, squared-L2 by the expansion d2 = |v|² − 2·v·c + |c|².
  *
  * Why a custom Expression: the composable form is an `array_min` over k
  * `struct(d2, cid)` entries, each with its own DotProduct — k struct
  * allocations per ROW plus a giant generated method. Assignment is the
  * inner loop of Lloyd k-means (rows × k × dims multiply-adds), so the
  * whole centroid matrix rides along as ONE codegen reference object and
  * the scan is a cache-friendly JVM loop: |v|² once per row, then one pass
  * per centroid over primitive arrays.
  *
  * FP parity with the composable form it replaces: |v|², each v·c, and the
  * precomputed |c|² all accumulate in ascending index order, and the
  * combination associates as ((vv − 2·dot) + cc) — bit-identical to
  * `vecDot(v,v) − 2·vecDot(v,c) + cc`. Ties in d2 keep the EARLIEST
  * centroid in `cids` order (callers pass ids ascending = min-cid
  * tie-break, matching `array_min`'s lexicographic struct order). */
case class NearestCentroid(child: Expression, cids: Array[Long],
                           centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cids.length == centroids.length && cids.nonEmpty,
    "need one id per centroid and at least one centroid")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cid",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("d2", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires an array<float> or array<double> vector, got ${other.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(et, _) => et == FloatType
    case _ => false
  }

  // |c|² precomputed once per plan, ascending-index order like DotProduct
  private lazy val normSq: Array[Double] = centroids.map { c =>
    var acc = 0.0; var j = 0
    while (j < c.length) { acc += c(j) * c(j); j += 1 }
    acc
  }

  /** The tight loop; also the codegen target (one virtual call per row). */
  def compute(vec: ArrayData): Any = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (vec.isNullAt(j)) return null // incomplete vector → NULL, like vec_dot
      v(j) = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      j += 1
    }
    var vv = 0.0
    j = 0
    while (j < n) { vv += v(j) * v(j); j += 1 }
    var bestCid = 0L
    var bestD2 = Double.PositiveInfinity
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      if (c.length != n) throw new IllegalArgumentException(
        s"nearest_centroid: vector has $n dims, centroid ${cids(i)} has ${c.length}")
      var dot = 0.0
      j = 0
      while (j < n) { dot += v(j) * c(j); j += 1 }
      val d2 = vv - 2.0 * dot + normSq(i)
      if (d2 < bestD2) { bestD2 = d2; bestCid = cids(i) } // strict: first/min cid wins ties
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestCid, bestD2)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this)
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object r = $ref.compute($c);
       |if (r == null) { ${ev.isNull} = true; } else {
       |  ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r;
       |}
     """.stripMargin)
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

/** Native top-`n` coarse-cell search by ROUNDED cosine: the ranked
  * `array<struct<cid, idx>>` of the `n` best cells for a vector, ordered
  * (cosine desc — 6 dp, like every IVF oracle — then cell id asc).
  *
  * Why a custom Expression: the composable form is an `array_min` /
  * `array_sort` over K `struct(-cs, cid, idx)` entries, each with its own
  * DotProduct against a K-vector literal — at test-sized K (tens of
  * cells) that works, but production IVF uses √n ≈ thousands of cells and
  * a K-term expression tree bloats codegen past the JIT's appetite (and
  * eventually whole-stage codegen's method limits). Like
  * [[NearestCentroid]], the whole cell matrix rides along as ONE
  * reference object and the scan is a cache-friendly JVM loop with a
  * fixed top-n insertion buffer.
  *
  * FP parity with the composable form it replaces (property-tested): the
  * vector norm is sqrt of the ascending-index |v|² sum, each dot
  * accumulates in ascending index order, the score is
  * `round(dot / (vNorm · cellNorm), 6)` with the same BigDecimal
  * HALF_UP rounding Spark's `round` applies to doubles, and ordering uses
  * `java.lang.Double.compare` — bit-identical to Spark's struct
  * comparison (−0.0 < 0.0) on the negated score. `idx` is the 1-based
  * position in the caller's cell matrix (for `element_at` residual
  * lookups). Null input or null element → NULL, like vec_dot. */
case class TopCells(child: Expression, n: Int, cids: Array[Long],
                    cells: Array[Array[Double]], norms: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "need n >= 1")
  require(cids.length == cells.length && cids.length == norms.length &&
    cids.nonEmpty, "need one id and norm per cell and at least one cell")

  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("idx", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_cells requires an array<float> or array<double> vector, got ${other.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(et, _) => et == FloatType
    case _ => false
  }

  /** round(x, 6) exactly as Spark's Round does for doubles —
    * BigDecimal.valueOf (decimal-string) semantics, NOT the exact-binary
    * `new BigDecimal(double)` constructor, which rounds differently on
    * values like 2.675. NaN/Infinity pass through unchanged (Spark's
    * RoundBase does the same; BigDecimal.valueOf would throw on them) —
    * a zero-norm vector or cell then yields NaN scores that sort after
    * every finite score under Double.compare, matching the crossJoin+
    * window form this expression replaced. */
  private def r6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The tight loop; also the codegen target (one virtual call per row). */
  def compute(vec: ArrayData): Any = {
    val d = vec.numElements()
    val v = new Array[Double](d)
    var j = 0
    while (j < d) {
      if (vec.isNullAt(j)) return null
      v(j) = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      j += 1
    }
    var vv = 0.0
    j = 0
    while (j < d) { vv += v(j) * v(j); j += 1 }
    val vNorm = math.sqrt(vv)
    val m = math.min(n, cids.length)
    // insertion-sorted top-m buffers on (negcs, cid) — m is tiny (nProbe)
    val bNeg = new Array[Double](m)
    val bCid = new Array[Long](m)
    val bIdx = new Array[Int](m)
    var filled = 0
    var i = 0
    while (i < cells.length) {
      val c = cells(i)
      if (c.length != d) throw new IllegalArgumentException(
        s"top_cells: vector has $d dims, cell ${cids(i)} has ${c.length}")
      var dot = 0.0
      j = 0
      while (j < d) { dot += v(j) * c(j); j += 1 }
      val neg = -r6(dot / (vNorm * norms(i)))
      // worse than the current worst of a full buffer? (compare mirrors
      // Spark's struct ordering: Double.compare, then cid asc)
      val cmpLast =
        if (filled < m) -1
        else {
          val c0 = java.lang.Double.compare(neg, bNeg(filled - 1))
          if (c0 != 0) c0 else java.lang.Long.compare(cids(i), bCid(filled - 1))
        }
      if (cmpLast < 0) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && {
          val c0 = java.lang.Double.compare(neg, bNeg(pos - 1))
          c0 < 0 || (c0 == 0 && cids(i) < bCid(pos - 1))
        }) {
          bNeg(pos) = bNeg(pos - 1); bCid(pos) = bCid(pos - 1)
          bIdx(pos) = bIdx(pos - 1)
          pos -= 1
        }
        bNeg(pos) = neg; bCid(pos) = cids(i); bIdx(pos) = i + 1
        if (filled < m) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(bCid(i), bIdx(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCells", this)
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object r = $ref.compute($c);
       |if (r == null) { ${ev.isNull} = true; } else {
       |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r;
       |}
     """.stripMargin)
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)

  override def prettyName: String = "top_cells"
}

object VectorExpressions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API for the native dot product. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for the native centroid argmin: struct(cid, d2). */
  def nearestCentroid(v: Column, cids: Array[Long],
                      centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expression(v), cids, centroids))

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
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs(0), TextExpressions.foldToInt(exprs(1)))))
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL DML (DELETE FROM / MERGE INTO / UPDATE / INSERT) over
    // graft-snapshot tables
    ext.injectResolutionRule(_ => graft.storage.SnapshotDmlRule)
    // deletion-vector overlay on the bare catalog relation — POST-HOC so
    // the DML rule claims mutation targets first
    ext.injectPostHocResolutionRule(session =>
      new graft.storage.SnapshotDvReadRule(session))
    // SQL time travel (VERSION AS OF / TIMESTAMP AS OF) — parser-level,
    // because the analyzer refuses v1 time travel before any injected
    // resolution rule can run
    ext.injectParser((session, delegate) =>
      new graft.storage.SnapshotTimeTravelParser(session, delegate))
  }
}
