package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension: a native AS-OF JOIN — the one join
  * family Spark's planner has no physical operator for (the DataFrame
  * idioms are a union + carry-forward window or a range join + dedup,
  * both of which materialize more than the answer needs). For each left
  * row, attach the LATEST right row of the same key whose time is ≤ the
  * left row's time — the state-at-event-time lookup (trade↔quote,
  * purchase↔last-signup, reading↔last-calibration).
  *
  * This is the (c)-tier extension path: custom `LogicalPlan` node +
  * `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` (GraftExtensions) and
  * `experimental.extraStrategies` ([[AsOfJoinExec.install]]).
  *
  * Scale shape — exactly a sort-merge join's: both sides hash-partition
  * on the key (EnsureRequirements inserts compatible exchanges from the
  * declared `ClusteredDistribution`s) and sort within partitions by
  * (key, time); the merge is then ONE forward pass over each partition
  * pair holding ONE buffered right row — no window state, no per-key
  * row buffering, no re-scan. Skew behaves like SMJ skew (AQE sees the
  * same exchanges).
  *
  * Contract: keys and times are non-null LongType (the engine's id/ts
  * convention); right rows equal in (key, time) resolve by the optional
  * `rightTieBreak` ordering — the LAST row in (time, tieBreak) order
  * wins, matching the carry-forward window's `last(...)` semantics.
  *
  * When to use which (measured, sf0.1 and 10× probe): when BOTH sides
  * are slices of the SAME table, the union + carry-forward window scans
  * the source once and wins (~2-3×) — keep `jx_asof_join`'s form there.
  * The exec's territory is as-of joins of DIFFERENT sources (trades ⋈
  * quotes), where any formulation scans both inputs and the merge's
  * one-buffered-row state replaces the window's carry across a unioned
  * stream of both schemas — and the window form additionally pays a
  * post-hoc filter to drop the right-side carrier rows. */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression,
                    rightTieBreak: Option[Expression])
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right), j.leftKey,
        j.rightKey, j.leftTime, j.rightTime, j.rightTieBreak) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTieBreak: Option[Expression])
  extends BinaryExecNode {

  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join keys and times must be LongType")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the merge preserves the left side's partitioning and ordering
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Primitive accessor: direct ordinal getLong for plain attribute
    * references (the common case — no per-row boxing), bound interpreted
    * eval otherwise. */
  private def longGetter(e: Expression,
                         schema: Seq[Attribute]): InternalRow => Long =
    e match {
      case a: Attribute if schema.exists(_.exprId == a.exprId) =>
        val i = schema.indexWhere(_.exprId == a.exprId)
        row => row.getLong(i)
      case other =>
        val bound = BindReferences.bindReference(other, schema)
        row => bound.eval(row).asInstanceOf[Long]
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKey = longGetter(leftKey, leftOut)
    val lTime = longGetter(leftTime, leftOut)
    val rKey = longGetter(rightKey, rightOut)
    val rTime = longGetter(rightTime, rightOut)
    val rightWidth = rightOut.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // one-row lookahead over the sorted right side
      var rHead: InternalRow = if (ri.hasNext) ri.next() else null
      // latest right row (copied — iterator rows are reused buffers)
      // with time ≤ the current left time, and the key it belongs to
      var lastRight: InternalRow = null
      var lastRightKey = 0L
      new Iterator[InternalRow] {
        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          val k = lKey(l)
          val t = lTime(l)
          // advance the right cursor past keys below k, and through
          // same-key rows with time ≤ t (each replaces the buffer — the
          // LAST qualifying row in sort order wins)
          var advancing = true
          while (advancing && rHead != null) {
            val rk = rKey(rHead)
            if (rk < k) {
              rHead = if (ri.hasNext) ri.next() else null
            } else if (rk == k && rTime(rHead) <= t) {
              lastRight = rHead.copy()
              lastRightKey = rk
              rHead = if (ri.hasNext) ri.next() else null
            } else {
              advancing = false
            }
          }
          val r =
            if (lastRight != null && lastRightKey == k) lastRight
            else nullRight
          resultProj(joined(l, r))
        }
      }
    }
  }
}

object AsOfJoinExec {

  /** The Dataset-level entry: as-of join `left` to `right` on equal key
    * columns with `rightTime ≤ leftTime`, latest right row winning
    * (ties in right time resolve by `rightTieBreak` ascending — last
    * wins). Column names must be distinct across sides for the columns
    * the caller keeps (rename before joining, as with any join). */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: Option[String] = None): DataFrame = {
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    org.apache.spark.sql.graft.DatasetBridge.ofRows(leftDf.sparkSession,
      AsOfJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime),
        rightTieBreak.map(attr(rp, _))))
  }

  /** Append the planner strategy to the session (idempotent) — the
    * `experimental` analogue of the GraftExtensions injection. */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }
}
