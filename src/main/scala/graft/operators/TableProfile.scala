package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-dynamic data profiling — the ingest-health report a pipeline
  * runs before trusting a new feed: per column, null count, exact
  * distinct cardinality, and mean rendered width. The reference's
  * preview endpoint (SqlTriggerFunctions.cs TOP-1000 scan) answers "what
  * does this table look like"; this is the aggregate form of the same
  * question.
  *
  * ONE pass over the input: every per-column statistic is an aggregate
  * in a single `agg`, then the 1×(3·cols) row unpivots via `stack` —
  * no per-column scans. The exact `countDistinct` set plans one Expand
  * (input ×cols before partial aggregation), which is the honest cost of
  * exact cardinalities; a 100 TB profile swaps `approx_count_distinct`
  * into the same shape (1-line change) and the Expand collapses to
  * mergeable HLL sketches. Widths use the STRING rendering so the
  * statistic is type-uniform (and bigint renderings are digit-identical
  * across engines). */
object TableProfile {

  /** Per-column profile of `df`: (column_name, n_rows, n_null,
    * n_distinct, avg_len), one row per column, avg_len null on all-null
    * columns. */
  def apply(df: DataFrame): DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndist"),
        round(avg(length(col(c).cast("string"))), 6).as(s"${c}__avglen"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nnull`, `${c}__ndist`, `${c}__avglen`")
      .mkString(", ")
    row.select(
        col("__n").as("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS " +
          "(column_name, n_null, n_distinct, avg_len)"))
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("avg_len"))
      .orderBy("column_name")
  }
}
