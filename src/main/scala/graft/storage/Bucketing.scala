package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage: pre-shuffle a fact table ONCE at write time so
  * every subsequent equi-join/aggregation on the bucket keys runs
  * shuffle-free (SortMergeJoin with no Exchange on either pre-bucketed
  * side).
  *
  * This is the 100 TB co-location strategy the operator docs reference: the
  * one-off bucketed write costs a shuffle, then the daily join pipeline
  * reads both sides already partitioned by key. Bucket counts should match
  * between co-joined tables and be sized so a bucket fits an executor core
  * (~128-256 MB of compressed parquet per bucket).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (saveAsTable is required —
    * plain parquet files carry no bucket metadata). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    var w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
