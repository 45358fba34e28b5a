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
    // events.parquet carries TIMESTAMP(NANOS). The engine-wide contract is
    // `ts` = bigint of epoch-nanos WITH A MICROSECOND PRECISION FLOOR:
    // older Spark 4 point releases honor the legacy long mapping below
    // (true nanos survive); Spark >= 4.1.2 ignores it and reads the column
    // natively as a (NTZ) timestamp truncated to microseconds — the
    // normalization after the read re-widens (`* 1000`), so the sub-micro
    // digits are zeros on those versions. Every oracle grain in this repo
    // (epoch_us/epoch_ms/seconds) sits at or above the floor and DuckDB's
    // parquet reader truncates the same way, so grading is version-stable
    // — but do NOT write a query that reads the ts value at epoch-NANOS
    // grain: its low digits are Spark-version-dependent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache.getOrElseUpdate((sfDir, name), {
      var df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events" &&
          df.schema("ts").dataType != org.apache.spark.sql.types.LongType) {
        // CAST from NTZ interprets the wall clock in the session time zone
        // — every entry point in this repo (and build.sbt's forked-JVM
        // javaOptions) pins spark.sql.session.timeZone=UTC, which is what
        // makes this the stored UTC instant.
        df = df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
      }
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
