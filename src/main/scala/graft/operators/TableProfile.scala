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
    * columns.
    *
    * Schema-dynamic for REAL: no column name is ever string-interpolated
    * into SQL. Inputs are renamed positionally (`toDF` — no parsing) to
    * safe internal names, the unpivot is built from typed Columns
    * (explode over an array of structs — the Expand-based equivalent of
    * `stack`), and the original names only appear as `lit(...)` string
    * LITERALS, so names containing quotes, backticks or dots profile
    * like any other. */
  def apply(df: DataFrame): DataFrame = {
    val cols = df.schema.fieldNames.toSeq
    val safe = df.toDF(cols.indices.map(i => s"c$i"): _*)
    val aggs = cols.indices.flatMap { i =>
      Seq(
        count(when(col(s"c$i").isNull, 1)).as(s"nnull_$i"),
        countDistinct(col(s"c$i")).as(s"ndist_$i"),
        round(avg(length(col(s"c$i").cast("string"))), 6).as(s"avglen_$i"))
    } :+ count(lit(1)).as("__n")
    val row = safe.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"), col(s"nnull_$i").as("n_null"),
        col(s"ndist_$i").as("n_distinct"), col(s"avglen_$i").as("avg_len"))
    }
    row.select(col("__n").as("n_rows"),
        explode(array(entries: _*)).as("p"))
      .select(col("p.column_name").as("column_name"), col("n_rows"),
        col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"),
        col("p.avg_len").as("avg_len"))
      .orderBy("column_name")
  }
}
