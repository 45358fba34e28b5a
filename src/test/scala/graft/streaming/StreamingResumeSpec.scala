package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kill-and-resume durability of the streaming state maintainers: persist
  * the driver-held state, stop the query, restart from the SAME checkpoint
  * with the persisted state as the seed, and prove (a) the source batches
  * already committed are NOT redelivered (checkpoint offsets do the
  * skipping) and (b) the final state equals an uninterrupted run over the
  * whole input.
  *
  * MemoryStream cannot survive a restart (its data lives in the dead
  * query), so these tests stream from a parquet FILE source — one file per
  * micro-batch via maxFilesPerTrigger — which replays from checkpoint
  * offsets exactly like any production replayable source. */
class StreamingResumeSpec extends SparkSpec {

  /** Write `df` as ONE parquet file into the streaming source dir (each
    * file is one micro-batch under maxFilesPerTrigger=1). */
  private def addSourceFile(srcDir: String, df: DataFrame, name: String): Unit = {
    val staging = java.nio.file.Files.createTempDirectory("stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(s"$srcDir/$name.parquet")))
  }

  private def fileStream(srcDir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(srcDir)

  test("StreamingConnectedComponents: kill, resume from checkpoint + seeded labels, equal to uninterrupted") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("scc-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scc-rck").toString
    val labelsDir = java.nio.file.Files.createTempDirectory("scc-lbl").toString + "/labels"
    val schema = Seq((1L, 2L)).toDF("doc_a", "doc_b").schema

    val b1 = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val b2 = Seq((10L, 11L)).toDF("doc_a", "doc_b")
    val b3 = Seq((3L, 10L), (20L, 21L)).toDF("doc_a", "doc_b")
    addSourceFile(src, b1, "b1")
    addSourceFile(src, b2, "b2")

    // phase 1: process b1+b2, persist the labeling, then KILL the query
    val (q1, h1) = StreamingConnectedComponents.start(
      fileStream(src, schema), ckpt)
    q1.processAllAvailable()
    h1.currentLabels.get.write.parquet(labelsDir)
    q1.stop()

    // phase 2: new data lands while the maintainer is down
    addSourceFile(src, b3, "b3")

    // phase 3: resume — same checkpoint, seeded from the persisted labels
    val (q2, h2) = StreamingConnectedComponents.start(
      fileStream(src, schema), ckpt,
      initialLabels = Some(spark.read.parquet(labelsDir)))
    q2.processAllAvailable()
    val resumed = h2.currentLabels.get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the checkpoint must skip the committed batches 0 (b1) and 1 (b2):
    // the resumed query's first batch id is 2 — b3 only. (Batch IDs, not
    // numInputRows: foreachBatch re-scans its input df per internal read,
    // which multiplies the row counter without redelivering anything.)
    val resumedBatches = q2.recentProgress.map(_.batchId).toSet
    q2.stop()
    assert(resumedBatches.nonEmpty && resumedBatches.min == 2,
      s"resume must start at the post-crash batch, ran $resumedBatches")

    // equality with the uninterrupted computation over ALL edges
    val all = b1.union(b2).union(b3)
    val ids = all.select(col("doc_a").as("doc_id"))
      .union(all.select(col("doc_b").as("doc_id"))).distinct()
    val uninterrupted = Dedup.connectedComponents(all, ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == uninterrupted,
      s"resumed:\n$resumed\nuninterrupted:\n$uninterrupted")
  }

  test("StreamingMinHashLsh: kill, resume from checkpoint + persisted index, equal to uninterrupted") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("lsh-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lsh-rck").toString
    val idxRoot = java.nio.file.Files.createTempDirectory("lsh-idx").toString
    val corpus1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (3L, "completely different text about spark shuffles and partitions here"))
    val corpus2 = Seq(
      (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (5L, "another unrelated document mentioning joins aggregations and windows"))
    val schema = corpus1.toDF("doc_id", "text").schema
    addSourceFile(src, corpus1.toDF("doc_id", "text"), "b1")

    // phase 1: index the first batch, persist all three index tables, KILL
    val (q1, h1) = StreamingMinHashLsh.start(fileStream(src, schema), ckpt)
    q1.processAllAvailable()
    val idx1 = h1.currentIndex.get
    idx1.sigs.write.parquet(s"$idxRoot/sigs")
    idx1.bands.write.parquet(s"$idxRoot/bands")
    idx1.pairs.write.parquet(s"$idxRoot/pairs")
    q1.stop()

    // phase 2: new docs land while the indexer is down
    addSourceFile(src, corpus2.toDF("doc_id", "text"), "b2")

    // phase 3: resume — same checkpoint, seeded from the persisted tables
    val seed = StreamingMinHashLsh.Index(
      spark.read.parquet(s"$idxRoot/sigs"),
      spark.read.parquet(s"$idxRoot/bands"),
      spark.read.parquet(s"$idxRoot/pairs"))
    val (q2, h2) = StreamingMinHashLsh.start(fileStream(src, schema), ckpt,
      initialIndex = Some(seed))
    q2.processAllAvailable()
    val resumed = h2.candidatePairs.get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val resumedBatches = q2.recentProgress.map(_.batchId).toSet
    val indexed = h2.indexedDocs.get.count()
    q2.stop()
    assert(resumedBatches.nonEmpty && resumedBatches.min == 1,
      s"resume must start at the post-crash batch, ran $resumedBatches")
    assert(indexed == 5, "resumed index must hold all docs exactly once")

    // equality with the uninterrupted batch pipeline over the whole corpus
    val batch = Dedup.minhashCandidates(
        (corpus1 ++ corpus2).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(resumed == batch, s"resumed:\n$resumed\nbatch:\n$batch")
    // the cross-restart duplicate (1, 4) must be found by the seeded index
    assert(resumed.contains((1L, 4L, 1.0)))
  }

  test("StreamingWeightedSample: kill, resume from checkpoint + seeded state, equal to uninterrupted") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("sws-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sws-rck").toString
    val stateDir = java.nio.file.Files.createTempDirectory("sws-st").toString + "/state"
    val corpus = (1L to 40L).map(i => (i, (i % 13 + 1).toDouble * 10))
    val schema = corpus.take(1).toDF("doc_id", "weight").schema

    addSourceFile(src, corpus.take(15).toDF("doc_id", "weight"), "b1")
    addSourceFile(src, corpus.slice(15, 25).toDF("doc_id", "weight"), "b2")

    // phase 1: process b1+b2, persist the top-rows state, KILL
    val (q1, h1) = StreamingWeightedSample.start(
      fileStream(src, schema), ckpt, "doc_id", "weight", n = 7)
    q1.processAllAvailable()
    h1.currentTopRows.get.write.parquet(stateDir)
    q1.stop()

    // phase 2: rows land while the sampler is down
    addSourceFile(src, corpus.drop(25).toDF("doc_id", "weight"), "b3")

    // phase 3: resume — same checkpoint, seeded from the persisted state
    val (q2, h2) = StreamingWeightedSample.start(
      fileStream(src, schema), ckpt, "doc_id", "weight", n = 7,
      initialState = Some(spark.read.parquet(stateDir)))
    q2.processAllAvailable()
    val resumed = h2.currentSample.get.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val resumedBatches = q2.recentProgress.map(_.batchId).toSet
    q2.stop()
    assert(resumedBatches.nonEmpty && resumedBatches.min == 2,
      s"resume must start at the post-crash batch, ran $resumedBatches")
    val uninterrupted = graft.operators.WeightedSample.prioritySample(
        corpus.toDF("doc_id", "weight"), "doc_id", col("weight"), 7)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(resumed == uninterrupted,
      s"resumed:\n$resumed\nuninterrupted:\n$uninterrupted")
  }
}
