package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Streaming IVF index maintenance: the cell index equals an independent
  * batch assignment of the union corpus, the coarse quantizer drifts with
  * the stream, and kill-and-resume (checkpoint + seeded model) matches an
  * uninterrupted run. Integer-valued vectors keep every centroid fold and
  * cosine exact, so comparisons are equality, not tolerance. */
class StreamingIvfIndexSpec extends SparkSpec {

  import spark.implicits._

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

  private val schema =
    Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding").schema

  // independent rounded-cosine argmax (cs desc, cid asc) — the IVF cell
  // convention, computed outside the engine
  private def refAssign(v: Array[Double],
                        cents: Seq[(Long, Array[Double])]): Long = {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def nrm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    cents.map { case (cid, c) =>
      val dp = v.zip(c).map { case (a, b) => a * b }.sum
      (cid, r6(dp / (nrm(v) * nrm(c))))
    }.minBy { case (cid, cs) => (-cs, cid) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))._1
  }

  test("streamed cell index equals batch assignment of the union corpus") {
    val src = java.nio.file.Files.createTempDirectory("ivf-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivf-ck").toString
    val corpus = java.nio.file.Files.createTempDirectory("ivf-co").toString + "/corpus"
    val b1 = Seq((1L, Array(4.0, 0.0)), (2L, Array(0.0, 4.0)))
      .toDF("vec_id", "embedding")
    val b2 = Seq((3L, Array(3.0, 1.0)), (4L, Array(1.0, 3.0)))
      .toDF("vec_id", "embedding")
    addSourceFile(src, b1, "b1")
    addSourceFile(src, b2, "b2")
    val init = Seq(10L -> Array(2.0, 0.0), 20L -> Array(0.0, 2.0))
    val (q, h) = StreamingIvfIndex.start(
      fileStream(src, schema), ckpt, corpus, init)
    q.processAllAvailable()
    q.stop()
    val got = h.currentIndex(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val union = Map(
      1L -> Array(4.0, 0.0), 2L -> Array(0.0, 4.0),
      3L -> Array(3.0, 1.0), 4L -> Array(1.0, 3.0))
    val want = union.map { case (id, v) =>
      id -> refAssign(v, h.currentModel.centroids)
    }
    assert(got == want, s"got $got want $want")
  }

  test("the coarse quantizer drifts: final centroids are the running means") {
    val src = java.nio.file.Files.createTempDirectory("ivfd-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfd-ck").toString
    val corpus = java.nio.file.Files.createTempDirectory("ivfd-co").toString + "/corpus"
    addSourceFile(src,
      Seq((1L, Array(6.0, 0.0)), (2L, Array(0.0, 6.0))).toDF("vec_id", "embedding"), "b1")
    addSourceFile(src,
      Seq((3L, Array(8.0, 0.0))).toDF("vec_id", "embedding"), "b2")
    val init = Seq(10L -> Array(1.0, 0.0), 20L -> Array(0.0, 1.0))
    val (q, h) = StreamingIvfIndex.start(
      fileStream(src, schema), ckpt, corpus, init)
    q.processAllAvailable()
    q.stop()
    val cents = h.currentModel.centroids.toMap
    // cell 10: b1 member (6,0) -> mean (6,0); b2 member (8,0) -> mean (7,0)
    assert(cents(10L).toSeq == Seq(7.0, 0.0), cents(10L).toSeq)
    // cell 20: one member ever -> (0,6)
    assert(cents(20L).toSeq == Seq(0.0, 6.0), cents(20L).toSeq)
    assert(h.currentModel.counts == Map(10L -> 2.0, 20L -> 1.0))
  }

  test("kill-and-resume from checkpoint + seeded model equals uninterrupted") {
    val src = java.nio.file.Files.createTempDirectory("ivfr-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfr-ck").toString
    val corpus = java.nio.file.Files.createTempDirectory("ivfr-co").toString + "/corpus"
    val b1 = Seq((1L, Array(4.0, 0.0)), (2L, Array(0.0, 4.0)))
      .toDF("vec_id", "embedding")
    val b2 = Seq((3L, Array(6.0, 2.0))).toDF("vec_id", "embedding")
    val b3 = Seq((4L, Array(2.0, 6.0)), (5L, Array(5.0, 5.0)))
      .toDF("vec_id", "embedding")
    addSourceFile(src, b1, "b1")
    addSourceFile(src, b2, "b2")
    val init = Seq(10L -> Array(2.0, 0.0), 20L -> Array(0.0, 2.0))

    // phase 1: fold b1+b2, remember the model, KILL
    val (q1, h1) = StreamingIvfIndex.start(
      fileStream(src, schema), ckpt, corpus, init)
    q1.processAllAvailable()
    val persisted = h1.currentModel
    q1.stop()

    // phase 2: data lands while the maintainer is down
    addSourceFile(src, b3, "b3")

    // phase 3: resume — same checkpoint + corpus, seeded with the model
    val (q2, h2) = StreamingIvfIndex.start(
      fileStream(src, schema), ckpt, corpus,
      persisted.centroids, initCounts = persisted.counts)
    q2.processAllAvailable()
    val resumedBatches = q2.recentProgress.map(_.batchId).toSet
    q2.stop()
    assert(resumedBatches.nonEmpty && resumedBatches.min == 2,
      s"committed batches must not redeliver, ran $resumedBatches")

    // uninterrupted run over the same three files
    val ckptU = java.nio.file.Files.createTempDirectory("ivfu-ck").toString
    val corpusU = java.nio.file.Files.createTempDirectory("ivfu-co").toString + "/corpus"
    val (qU, hU) = StreamingIvfIndex.start(
      fileStream(src, schema), ckptU, corpusU, init)
    qU.processAllAvailable()
    qU.stop()

    assert(h2.currentModel.centroids.map { case (c, a) => (c, a.toSeq) } ==
      hU.currentModel.centroids.map { case (c, a) => (c, a.toSeq) })
    assert(h2.currentModel.counts == hU.currentModel.counts)
    val idx = h2.currentIndex(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val idxU = hU.currentIndex(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx == idxU && idx.keySet == Set(1L, 2L, 3L, 4L, 5L), s"$idx")
  }
}
