package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned-layout storage: directory-partition fact tables on their
  * pruning column (date/region) so queries touching a slice read only that
  * slice.
  *
  * Two pruning regimes both depend on this layout:
  *  - static: a literal filter on the partition column prunes at planning
  *    (`PartitionFilters` in the scan);
  *  - dynamic (DPP): a join against a filtered dim prunes at runtime — the
  *    dim's keys become a subquery filter on the fact's partition column
  *    (`dynamicpruningexpression` in the plan).
  * At 100 TB the partition column choice IS the table design: date for
  * time-series facts, coarse enough that each partition holds many
  * row-groups.
  */
object Partitioning {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
