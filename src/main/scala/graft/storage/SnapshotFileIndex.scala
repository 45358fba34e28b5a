package graft.storage

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Or => COr}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-integrated read path for the snapshot store — the Delta
  * `TahoeFileIndex` shape: a custom [[FileIndex]] whose `listFiles`
  * receives the query's OWN pushed-down data filters from
  * `FileSourceScanExec` and prunes the manifest's file list against the
  * per-file min/max stats before any split is planned. The payoff over
  * [[SnapshotStore.readAsOfWhere]]: a plain
  * `readAsOfTable(...).filter($"x" > 5)` — or the same predicate
  * arriving through SQL — skips files with NO explicit
  * [[SnapshotStore.FilePredicate]] plumbing, while Spark's standard
  * parquet path keeps predicate pushdown (row groups), column pruning,
  * and whole-stage codegen: the plan is an ordinary `FileScan parquet`
  * whose input files happen to be the stats-surviving subset.
  *
  * Filter translation is CONSERVATIVE: comparison atoms over bare
  * attributes and foldable literals translate; anything else keeps
  * every file. An AND may translate any subset of its conjuncts
  * (pruning on fewer conjuncts only keeps more files); an OR translates
  * only if BOTH arms do. Spark re-applies the full predicate on the
  * rows, so translation gaps cost I/O, never correctness.
  *
  * Scale shape: one driver-side pass over the manifest entries per
  * query (the same cost class as Delta's log-backed index); file sizes
  * come from the manifest's commit-time records — NO per-file
  * filesystem RPC (legacy pre-size manifest entries fall back to
  * `getFileStatus`). */
final class SnapshotFileIndex(spark: SparkSession, dir: String,
                              m: SnapshotStore.Manifest) extends FileIndex {

  private val statuses: Seq[(String, FileStatus)] = {
    lazy val fs =
      new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    m.files.map { f =>
      // manifest-recorded size → no per-file RPC (the ~800k-file case);
      // legacy entries without sizes fall back to one getFileStatus.
      // mtime 0 is safe: snapshot data files are immutable and this
      // index is built fresh per read (no FileStatusCache keying).
      val status = m.stats.get(f).map(_.bytes).filter(_ > 0L)
        .map(sz => new FileStatus(sz, false, 1, 128L * 1024 * 1024, 0L,
          new Path(f)))
        .getOrElse(fs.getFileStatus(new Path(f)))
      f -> status
    }
  }

  /** files surfaced by the most recent `listFiles` — lets specs assert
    * the pruning that actually reached the scan */
  @volatile var lastListedCount: Int = -1

  override def rootPaths: Seq[Path] = Seq(new Path(dir))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // every translated conjunct prunes independently (AND semantics)
    val preds = dataFilters.flatMap(SnapshotFileIndex.fromCatalyst)
    val kept = statuses.filter { case (f, _) =>
      m.stats.get(f).forall(st => preds.forall(_.mightMatch(st)))
    }
    lastListedCount = kept.length
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }

  override def inputFiles: Array[String] = m.files.toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum
  override def partitionSchema: StructType = new StructType()
}

object SnapshotFileIndex {

  import SnapshotStore.FilePredicate
  import SnapshotStore.FilePredicate._

  private def litValue(l: Literal): Option[Any] = Option(l.value).map {
    case u: UTF8String => u.toString
    case other => other // Int/Long/Short/Byte/Float/Double/Boolean,
                        // date epoch-days (Int), timestamp micros (Long)
  } match {
    case Some(n: java.lang.Float) => Some(n.doubleValue())
    case other => other
  }

  /** Conservative Catalyst → [[FilePredicate]] translation (None =
    * cannot prune on this expression; correctness never depends on it). */
  private[storage] def fromCatalyst(e: Expression): Option[FilePredicate] = e match {
    case EqualTo(a: AttributeReference, l: Literal) =>
      litValue(l).map(EqTo(a.name, _))
    case EqualTo(l: Literal, a: AttributeReference) =>
      litValue(l).map(EqTo(a.name, _))
    case GreaterThan(a: AttributeReference, l: Literal) =>
      litValue(l).map(Gt(a.name, _))
    case GreaterThan(l: Literal, a: AttributeReference) =>
      litValue(l).map(Lt(a.name, _))
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      litValue(l).map(GtEq(a.name, _))
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      litValue(l).map(LtEq(a.name, _))
    case LessThan(a: AttributeReference, l: Literal) =>
      litValue(l).map(Lt(a.name, _))
    case LessThan(l: Literal, a: AttributeReference) =>
      litValue(l).map(Gt(a.name, _))
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      litValue(l).map(LtEq(a.name, _))
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      litValue(l).map(GtEq(a.name, _))
    case CAnd(x, y) =>
      (fromCatalyst(x), fromCatalyst(y)) match {
        case (Some(px), Some(py)) => Some(And(px, py))
        case (px, py) => px.orElse(py) // subset of conjuncts: conservative
      }
    case COr(x, y) =>
      for (px <- fromCatalyst(x); py <- fromCatalyst(y)) yield Or(px, py)
    case _ => None
  }

  /** Time-travel read through the Catalyst-integrated index: an
    * ordinary parquet `DataFrame` whose scan lists only the files of
    * `version` that survive the query's own pushed-down filters. */
  def readAsOfTable(spark: SparkSession, dir: String,
                    version: Long): DataFrame = {
    val (df, _) = readAsOfTableWithIndex(spark, dir, version)
    df
  }

  /** [[readAsOfTable]] plus the index, for pruning assertions. */
  def readAsOfTableWithIndex(spark: SparkSession, dir: String,
                             version: Long): (DataFrame, SnapshotFileIndex) = {
    val m = SnapshotStore.manifest(spark, dir, version)
    require(m.files.nonEmpty, s"version $version holds no data files")
    val schema = m.schemaStruct
      .getOrElse(spark.read.parquet(m.files: _*).schema)
    val index = new SnapshotFileIndex(spark, dir, m)
    val relation = HadoopFsRelation(index, new StructType(), schema, None,
      new ParquetFileFormat(), Map.empty)(spark)
    (spark.baseRelationToDataFrame(relation), index)
  }
}
