package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AllowlistProjection, ChangeFeed}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the flagship end-to-end pipeline (change feed → dedup-to-latest
  * → allowlist projection → JSON payload); `queries`/`oracleSql` enumerate
  * every SQL-expressible operator from SURVEY.md §2 with a DuckDB oracle.
  */
object SparkEntry {

  /** Flagship pipeline on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Emulates the reference's CDC delivery (README.md:5,19-23): two
    * lineitem snapshots diffed on the PK → change batch of current-row
    * states → dedup-to-latest per key → column-allowlist projection →
    * JSON wire payload.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    // old snapshot: drop some rows (→ Inserts in new), perturb others (→ Updates)
    val oldSnap = li.filter(col("l_orderkey") % 10 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 7 === 0, col("l_quantity") + 1).otherwise(col("l_quantity")))
    // new snapshot: drop a different slice (→ Deletes)
    val newSnap = li.filter(col("l_orderkey") % 13 =!= 0)
    val pk = Seq("l_orderkey", "l_linenumber")
    val changes = ChangeFeed.diff(oldSnap, newSnap, pk)
    val latest = ChangeFeed.dedupLatest(changes, pk, "l_shipdate", Seq("Operation"))
    val projected = AllowlistProjection(
      latest,
      config = Some("Operation,l_orderkey,l_linenumber,l_quantity,l_extendedprice"),
      client = Some("L_SHIPDATE"))
    ChangeFeed.toJsonPayload(projected)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
    graft.queries.RelQueries.queries ++
    graft.queries.ScalarQueries.queries ++
    graft.queries.StreamQueries.queries ++
    graft.queries.ExtQueries.queries ++
    graft.queries.SeqQueries.queries ++
    graft.queries.SqlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
    graft.queries.RelQueries.oracle ++
    graft.queries.ScalarQueries.oracle ++
    graft.queries.StreamQueries.oracle ++
    graft.queries.ExtQueries.oracle ++
    graft.queries.SeqQueries.oracle ++
    graft.queries.SqlQueries.oracle
}
