package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE's runtime skew-join split — the automatic complement to explicit
  * SkewJoin salting: with thresholds lowered to demo scale, a hot key's
  * oversized shuffle partition is split across tasks at runtime
  * (`isSkewJoin` on the SMJ). */
class AqeSkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("AQE splits a skewed shuffle partition at runtime") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8")
    val previous = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on ONE key vs 200 spread keys: partition for key 1 is huge
      val hot = spark.range(200000).select(lit(1L).as("k"),
        concat(lit("payload_"), col("id").cast("string")).as("v"))
      val rest = spark.range(200).select((col("id") + 2).as("k"),
        col("id").cast("string").as("v"))
      val left = hot.union(rest)
      val right = spark.range(300).select((col("id") + 1).as("k"),
        lit("dim").as("label"))
      val joined = left.join(right, Seq("k"))
      // collect() executes THIS DataFrame's own QueryExecution, finalizing
      // its adaptive plan (count()/write would run a derived plan instead)
      assert(joined.collect().length == 200000 + 200)
      val smj = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "expected a sort-merge join")
      assert(smj.exists(_.isSkewJoin),
        s"AQE should mark the join skew-split:\n${joined.queryExecution.executedPlan}")
    } finally previous.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
