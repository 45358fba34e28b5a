package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated star-schema testdata
  * (see /root/repo/TESTDATA.md). One parquet file per table.
  *
  * All operators take a `sfDir` (e.g. /root/testdata/sf0.01) so the same
  * code runs at every scale factor; at cluster scale the paths would be
  * directories of many files and nothing here changes.
  */
object Tables {
  // One benchmark/verify run touches each table from many queries; reuse a
  // single (optionally persisted) DataFrame per table so repeated queries
  // hit the in-memory columnar cache instead of re-scanning parquet.
  // At cluster scale this maps to caching hot dims — fact tables at 100 TB
  // would NOT be persisted (set SPARK_GRAFT_NO_CACHE=1 to disable).
  //
  // Bounding the cache to one scale factor is an EXPLICIT lifecycle call
  // ([[evictOtherScaleFactors]], invoked by the Bench/Verify entry points
  // at startup), not a side effect of read(): a library caller holding
  // DataFrames built over another sfDir must not silently lose its
  // in-memory columnar cache mid-plan just because a different scale
  // factor was read concurrently.
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private val persistEnabled = !sys.env.contains("SPARK_GRAFT_NO_CACHE")

  /** Unpersist and drop every cached table of scale factors other than
    * `sfDir`, so a run that moves between scale factors holds one working
    * set, not their union. Call at entry-point startup (Bench/Verify do),
    * never mid-query. */
  def evictOtherScaleFactors(sfDir: String): Unit = {
    val stale = cache.keys.filter(_._1 != sfDir).toSeq
    if (stale.nonEmpty) {
      stale.foreach(k => cache.remove(k).foreach(_.unpersist(false)))
      println(s"[graft] table cache evicted ${stale.size} entries of other " +
        "scale factors")
    }
  }

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark 4 only reads via
    // the legacy long mapping; `ts` is therefore a bigint of epoch-nanos.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache.getOrElseUpdate((sfDir, name), {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (persistEnabled) df.persist() else df
    })
  }

  /** events.ts (epoch nanos, bigint) → epoch seconds, bigint. */
  def tsEpochSeconds: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr("ts DIV 1000000000")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = read(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
