package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PartitioningSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("static partition pruning: literal filter reads only matching partitions") {
    import spark.implicits._
    val path = Files.createTempDirectory("part").toString + "/orders"
    val df = (1 to 1000).map(i => (i.toLong, 1995 + i % 5, i * 1.5))
      .toDF("id", "year", "amount")
    Partitioning.writePartitioned(df, path, Seq("year"))

    val q = Partitioning.readPartitioned(spark, path).filter($"year" === 1997)
    assert(q.count() == 200)
    val scan = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }.head
    // partition filter applied => only one of five year= dirs is listed
    assert(scan.metadata("PartitionFilters").contains("year"),
      s"partition filter missing: ${scan.metadata("PartitionFilters")}")
    assert(scan.selectedPartitions.partitionCount == 1, "exactly one partition read")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    // default DPP config: the broadcast-reuse path inserts the pruning
    // subquery regardless of the size-benefit heuristic
    {
      val base = Files.createTempDirectory("dpp").toString
      val path = s"$base/fact"
      val fact = (1 to 2000).map(i => (i.toLong, 1995 + i % 5, i * 1.0))
        .toDF("id", "year", "amount")
      Partitioning.writePartitioned(fact, path, Seq("year"))
      // the dim must be FILE-backed: a local Seq gets constant-folded into a
      // LocalTableScan, leaving no selective Filter for the DPP rule to see
      Seq((1997, "pick-me"), (2010, "absent")).toDF("d_year", "label")
        .write.parquet(s"$base/dim")
      val dim = spark.read.parquet(s"$base/dim")

      val joined = Partitioning.readPartitioned(spark, path)
        .join(dim.filter($"label" === "pick-me"), $"year" === $"d_year")
      assert(joined.count() == 400)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"expected a dynamic pruning subquery in:\n$planStr")
    }
  }
}
