package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatasetSplitSpec extends SparkSpec {

  test("every member of a cluster lands in the same split") {
    import spark.implicits._
    // 200 docs in 50 clusters of 4
    val clusters = (1 to 200).map(i => (i.toLong, (i % 50).toLong))
      .toDF("doc_id", "cluster_id")
    val split = DatasetSplit.leakageSafeSplit(clusters, "cluster_id", 80, 10)
    val perCluster = split.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(perCluster == 1L, "a cluster must never straddle splits")
  }

  test("deterministic and roughly proportional") {
    import spark.implicits._
    val clusters = (1 to 1000).map(i => (i.toLong, i.toLong))
      .toDF("doc_id", "cluster_id")
    val s1 = DatasetSplit.leakageSafeSplit(clusters, "cluster_id", 80, 10)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = DatasetSplit.leakageSafeSplit(clusters, "cluster_id", 80, 10)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "same input must produce the same split")
    // hash-uniformity: within a loose band of the 80/10/10 request
    assert(s1("train") > 700 && s1("train") < 900, s"got $s1")
    assert(s1("val") > 50 && s1("val") < 180, s"got $s1")
    assert(s1("test") > 50 && s1("test") < 180, s"got $s1")
  }

  test("invalid percentages rejected") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    intercept[IllegalArgumentException](
      DatasetSplit.leakageSafeSplit(df, "cluster_id", 95, 10))
    intercept[IllegalArgumentException](
      DatasetSplit.leakageSafeSplit(df, "cluster_id", -1, 10))
  }
}
