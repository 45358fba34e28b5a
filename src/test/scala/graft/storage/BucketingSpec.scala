package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("co-bucketed join plans with NO shuffle exchange on either side") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      Bucketing.writeBucketed(a, "bkt_a", Seq("k"), 4, sortCols = Seq("k"))
      Bucketing.writeBucketed(b, "bkt_b", Seq("k"), 4, sortCols = Seq("k"))

      val joined = Bucketing.readBucketed(spark, "bkt_a")
        .join(Bucketing.readBucketed(spark, "bkt_b"), Seq("k"))
      assert(joined.count() == 1000)

      val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case e: Exchange => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join must be shuffle-free, found: ${exchanges.map(_.nodeName)}")

      // contrast: the same join over plain (unbucketed) data DOES shuffle
      val plain = a.join(b, Seq("k"))
      plain.count()
      val plainExchanges = collectWithSubqueries(plain.queryExecution.executedPlan) {
        case e: Exchange => e
      }
      assert(plainExchanges.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("change-feed diff over co-bucketed snapshots is shuffle-free (the j1 scale path)") {
    // j1's full-outer snapshot diff is the biggest shuffle on the bench; the
    // ChangeFeed scaladoc prescribes PK-bucketed snapshot storage as the
    // cluster remedy — prove the exchange actually disappears there
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rows = (1 to 2000).map(i => (i.toLong, (i % 7).toLong, s"v$i"))
      val oldSnap = rows.filter(_._1 % 10 != 0).toDF("pk1", "pk2", "payload")
      val newSnap = rows.filter(_._1 % 13 != 0)
        .map { case (a, b, v) => (a, b, if (a % 5 == 0) v + "!" else v) }
        .toDF("pk1", "pk2", "payload")
      Bucketing.writeBucketed(oldSnap, "bkt_old", Seq("pk1", "pk2"), 4,
        sortCols = Seq("pk1", "pk2"))
      Bucketing.writeBucketed(newSnap, "bkt_new", Seq("pk1", "pk2"), 4,
        sortCols = Seq("pk1", "pk2"))
      val diff = graft.operators.ChangeFeed.diff(
        Bucketing.readBucketed(spark, "bkt_old"),
        Bucketing.readBucketed(spark, "bkt_new"), Seq("pk1", "pk2"))
      assert(diff.count() > 0)
      val exchanges = collectWithSubqueries(diff.queryExecution.executedPlan) {
        case e: Exchange => e
      }
      assert(exchanges.isEmpty,
        s"bucketed diff must be shuffle-free, found: ${exchanges.map(_.nodeName)}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_old")
      spark.sql("DROP TABLE IF EXISTS bkt_new")
    }
  }
}
