package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of GENERATED ALWAYS AS IDENTITY (round 20 —
  * `graft.identity.<col>` on the generated-defaults machinery): the
  * commit allocates dense monotonic values in the frame's row order,
  * the high-water mark rides the SAME commit's property map (never
  * reused across commits, race-safe under the lost-race re-stage),
  * writers must omit the column (or null-fill it through an INSERT
  * column list), row-replacing merges refuse, and RENAME/DROP of the
  * declared column refuse like any referenced column. */
class SnapshotIdentitySpec extends SparkSpec {

  import spark.implicits._

  private val store = SnapshotStore

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapident").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("dense allocation across commits: start/step respected, the " +
    "high-water mark carries, values never reuse") {
    val dir = freshDir()
    store.commit(spark, dir,
      (1L to 7L).map(i => (i, s"a$i")).toDF("k", "txt").coalesce(1)
        .sortWithinPartitions("k"),
      "ingest", tblProperties = Map("graft.identity.id" -> "100,10"))
    val v1 = store.read(spark, dir).select("k", "id")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(v1.map(_._2).toSeq == (0L until 7L).map(100L + _ * 10L),
      s"first commit allocates [100, 170) step 10 in row order, got " +
        v1.mkString(","))
    store.commitAppend(spark, dir,
      (8L to 10L).map(i => (i, s"b$i")).toDF("k", "txt").coalesce(1)
        .sortWithinPartitions("k"), "append")
    val all = store.read(spark, dir).select("id").as[Long].collect().sorted
    assert(all.toSeq == (0L until 10L).map(100L + _ * 10L),
      s"the append continues at the carried high water, got " +
        all.mkString(","))
    // the high-water property rides the manifest
    val hw = store.manifest(spark, dir,
      store.latestVersion(spark, dir).get).properties
      .get("graft.identityHighWater.id")
    assert(hw.contains("200"), s"high water after 10 rows: $hw")
  }

  test("GENERATED ALWAYS: a non-null writer value refuses; a present-" +
    "but-all-null column allocates in place (the INSERT column-list " +
    "shape); merges refuse; RENAME/DROP of the column refuse") {
    val dir = freshDir()
    store.commit(spark, dir,
      Seq((1L, "a")).toDF("k", "txt"), "ingest",
      tblProperties = Map("graft.identity.id" -> "0,1"))
    val e = intercept[IllegalArgumentException](
      store.commitAppend(spark, dir,
        Seq((2L, "b", 99L)).toDF("k", "txt", "id"), "append"))
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // present-but-all-null: allocated, and the column keeps its position
    store.commitAppend(spark, dir,
      Seq(("c", null.asInstanceOf[java.lang.Long], 3L))
        .toDF("txt", "id", "k")
        .select(col("k"), col("txt"), col("id").cast("long")), "append")
    val rows = store.read(spark, dir).select("k", "id")
      .as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 0L, 3L -> 1L), s"got $rows")
    val em = intercept[IllegalArgumentException](
      store.merge(spark, dir, Seq((1L, "x")).toDF("k", "txt"), Seq("k")))
    assert(em.getMessage.contains("GENERATED ALWAYS"))
    val ema = intercept[IllegalArgumentException](
      store.mergeAuto(spark, dir, Seq((1L, "x")).toDF("k", "txt"), Seq("k")))
    assert(ema.getMessage.contains("GENERATED ALWAYS"))
    val er = intercept[Exception](store.renameColumn(spark, dir, "id", "id2"))
    assert(er.getMessage.contains("identity"),
      s"rename of the identity column must refuse: ${er.getMessage}")
    val ed = intercept[Exception](store.dropColumn(spark, dir, "id"))
    assert(ed.getMessage.contains("identity"),
      s"drop of the identity column must refuse: ${ed.getMessage}")
  }

  test("SYNC IDENTITY repairs the high water after a RESTORE re-issued " +
    "an undone range — the next allocation clears every live value " +
    "(API + SQL faces)") {
    val dir = freshDir()
    store.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "txt").coalesce(1)
        .sortWithinPartitions("k"), "ingest",
      tblProperties = Map("graft.identity.id" -> "0,1"))           // ids 0,1
    store.commitAppend(spark, dir,
      Seq((3L, "c")).toDF("k", "txt"), "append")                   // id 2
    store.restore(spark, dir, 1L) // header rolls back: water = 2 again
    // without repair, the next append would re-issue id 2 — documented;
    // SYNC IDENTITY recomputes from the LIVE data (max 1 → next 2 is
    // correct here since v3 restored the 2-row state; then append,
    // restore PAST that append, and prove the collision window closes)
    store.commitAppend(spark, dir,
      Seq((4L, "d")).toDF("k", "txt"), "append")                   // id 2 again (restored water)
    val tbl = "idn_sync_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$dir')")
    try {
      spark.sql(s"ALTER TABLE $tbl SYNC IDENTITY")
      val hw = store.manifest(spark, dir,
        store.latestVersion(spark, dir).get).properties
        .get("graft.identityHighWater.id")
      assert(hw.contains("3"), s"water recomputed from live max 2: $hw")
      store.commitAppend(spark, dir,
        Seq((5L, "e")).toDF("k", "txt"), "append")
      val ids = store.read(spark, dir).select("id").as[Long].collect()
      assert(ids.length == ids.distinct.length,
        s"no collision after the repair: ${ids.sorted.mkString(",")}")
      assert(ids.max == 3L)
      // refusal: no identity declared
      val dir2 = freshDir()
      store.commit(spark, dir2, Seq((1L, "x")).toDF("k", "txt"), "ingest")
      val e = intercept[IllegalArgumentException](
        store.syncIdentity(spark, dir2))
      assert(e.getMessage.contains("graft.identity"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("two CONCURRENT appends both land with disjoint dense ranges — " +
    "the lost-race re-stage re-allocates against the winner's water") {
    val dir = freshDir()
    store.commit(spark, dir,
      Seq((0L, "seed")).toDF("k", "txt"), "ingest",
      tblProperties = Map("graft.identity.id" -> "0,1"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val fs = (0 until 2).map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            val df = ((1L + t * 100L) to (50L + t * 100L))
              .map(i => (i, s"w$t-$i")).toDF("k", "txt")
            barrier.await()
            // distinct operation names → distinct staging dirs, so the
            // race is decided at the manifest rename (the commit point),
            // and the loser re-stages against the winner's high water
            store.commitAppend(spark, dir, df, s"append-w$t")
          }
        })
      }
      fs.foreach(_.get())
    } finally pool.shutdown()
    val ids = store.read(spark, dir).select("id").as[Long].collect().sorted
    assert(ids.length == 101 && ids.distinct.length == 101,
      s"both appends land, no id reused: ${ids.length}")
    assert(ids.toSeq == (0L until 101L).toSeq,
      s"allocation stays DENSE across the race: min=${ids.head} " +
        s"max=${ids.last}")
  }

  test("NON-DETERMINISTIC source frame: allocation pins the rows once — " +
    "count, zipWithIndex and the written data all see the same " +
    "evaluation, so values stay dense and the high water agrees exactly") {
    val dir = freshDir()
    IdentityFlakyEvals.n.set(0)
    // a source whose row count CHANGES per evaluation (the worst case of
    // sample/rand/re-executed-shuffle non-determinism): evaluation k
    // yields 5+k rows — without the materialization pin, count() (one
    // evaluation) and zipWithIndex+write (later evaluations) disagree
    val rdd = spark.sparkContext.parallelize(Seq(0), 1).mapPartitions { _ =>
      val k = IdentityFlakyEvals.n.incrementAndGet()
      (1 to (5 + k)).iterator.map(i =>
        org.apache.spark.sql.Row(i.toLong, s"r$i"))
    }
    val df = spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("txt",
          org.apache.spark.sql.types.StringType, nullable = false))))
    store.commit(spark, dir, df, "ingest",
      tblProperties = Map("graft.identity.id" -> "0,1"))
    val rows = store.read(spark, dir).select("id").as[Long].collect().sorted
    val hw = store.manifest(spark, dir, store.latestVersion(spark, dir).get)
      .properties("graft.identityHighWater.id").toLong
    assert(rows.toSeq == (0L until rows.length.toLong),
      s"allocated values must be dense from 0, got ${rows.mkString(",")}")
    assert(hw == rows.length.toLong,
      s"recorded high water ($hw) must equal the rows actually written " +
        s"(${rows.length}) — the source was evaluated exactly once")
  }
}

/** per-JVM evaluation counter for the non-deterministic-source identity
  * spec (an object so the task closure resolves the SAME singleton after
  * deserialization) */
object IdentityFlakyEvals {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
}
