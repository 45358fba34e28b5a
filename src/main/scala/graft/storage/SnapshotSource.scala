package graft.storage

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, FileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** Registered data-source face of the snapshot store:
  *
  * {{{
  *   spark.read.format("graft-snapshot").load(tableDir)          // latest
  *   spark.read.format("graft-snapshot")
  *     .option("version", 3).load(tableDir)                      // time travel
  *   // and through SQL DDL:
  *   CREATE TABLE t USING `graft-snapshot`
  *     OPTIONS (path '<tableDir>', version '3')
  * }}}
  *
  * The relation is the same stats-pruning [[SnapshotFileIndex]]-backed
  * parquet relation as [[SnapshotFileIndex.readAsOfTable]] — any WHERE
  * on the table file-skips through the manifest stats, and the plan
  * stays an ordinary codegen'd parquet FileScan. Registration rides the
  * standard `RelationProvider` SPI (resolved by class name here — the
  * engine is a library, not a packaged jar with service files; both the
  * short name `graft-snapshot` via [[DataSourceRegister]] and the full
  * class name `graft.storage.SnapshotSource` work once the class is on
  * the session's classpath). */
final class SnapshotSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = parameters.getOrElse("path",
      sys.error("graft-snapshot needs a path (load(dir) or OPTIONS(path ...))"))
    val version = parameters.get("version").map(_.trim.toLong)
      .orElse(SnapshotStore.latestVersion(spark, dir))
      .getOrElse(sys.error(s"no committed version at $dir"))
    val m = SnapshotStore.manifest(spark, dir, version)
    require(m.files.nonEmpty, s"version $version holds no data files")
    val schema = spark.read.parquet(m.files: _*).schema
    val index: FileIndex = new SnapshotFileIndex(spark, dir, m)
    HadoopFsRelation(index, new StructType(), schema, None,
      new ParquetFileFormat(), Map.empty)(spark)
  }
}
