package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingBottomKSpec extends SparkSpec {

  // three sources built from overlapping word pools: A and B share half
  // their material, C is mostly disjoint
  private val corpus: Seq[(Long, String, String)] = {
    def text(seed: Long, pool: Seq[String]) =
      (0 until 12).map(i => pool(((seed * 31 + i * 7) % pool.length).toInt))
        .mkString(" ")
    val shared = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val aOnly = Seq("scan", "table", "index")
    val bOnly = Seq("merge", "sort", "hash")
    val cOnly = Seq("red", "green", "blue", "cyan", "teal", "pink")
    (1L to 36L).map { i =>
      val (src, pool) = (i % 3) match {
        case 0 => ("srcA", shared ++ aOnly)
        case 1 => ("srcB", shared ++ bOnly)
        case _ => ("srcC", cOnly)
      }
      (i, text(i, pool), src)
    }
  }

  private val K = 16
  private val Mod = 1L << 40

  private def sketchOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def toDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("streamed sketch equals the batch cut of the union at every fold point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("bk-ckpt").toString
    val (q, handle) = StreamingBottomK.start(
      input.toDF().toDF("doc_id", "text", "source"), ckpt, K, Mod)
    Seq(10, 24, 36).foldLeft(0) { (prev, upTo) =>
      input.addData(corpus.slice(prev, upTo): _*)
      q.processAllAvailable()
      val want = sketchOf(StreamingBottomK.batchSketch(
        toDf(corpus.take(upTo)), K, Mod))
      assert(sketchOf(handle.currentSketch.get) == want, s"at fold $upTo")
      upTo
    }
    q.stop()
  }

  test("replay is a no-op without any batch cursor (idempotent set fold)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("bk-ckpt2").toString
    val (q, handle) = StreamingBottomK.start(
      input.toDF().toDF("doc_id", "text", "source"), ckpt, K, Mod)
    input.addData(corpus.take(20): _*)
    q.processAllAvailable()
    input.addData(corpus.take(20): _*) // full redelivery
    q.processAllAvailable()
    val got = sketchOf(handle.currentSketch.get)
    q.stop()
    assert(got == sketchOf(StreamingBottomK.batchSketch(
      toDf(corpus.take(20)), K, Mod)))
  }

  test("seeded restart continues the fold; estimates respect the 3/sqrt(k) bound") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("bk-ckpt3").toString
    val (q, handle) = StreamingBottomK.start(
      input.toDF().toDF("doc_id", "text", "source"), ckpt, K, Mod)
    input.addData(corpus.take(18): _*)
    q.processAllAvailable()
    val persisted = handle.currentSketch.get
    q.stop()

    val input2 = MemoryStream[(Long, String, String)]
    val ckpt2 = java.nio.file.Files.createTempDirectory("bk-ckpt4").toString
    val (q2, handle2) = StreamingBottomK.start(
      input2.toDF().toDF("doc_id", "text", "source"), ckpt2, K, Mod,
      initialState = Some(persisted))
    input2.addData(corpus.drop(18): _*)
    q2.processAllAvailable()
    val sketch = handle2.currentSketch.get
    assert(sketchOf(sketch) == sketchOf(StreamingBottomK.batchSketch(
      toDf(corpus), K, Mod)))

    // estimates vs brute-force exact Jaccard over the full corpus
    val est = handle2.resemblance().get.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    q2.stop()
    val sets = corpus.groupBy(_._3).map { case (s, rows) =>
      s -> rows.flatMap { case (_, t, _) =>
        t.split(" ").sliding(3).map(_.mkString(" ")).toSeq
      }.toSet
    }
    val bound = 3.0 / math.sqrt(K.toDouble)
    for {
      a <- sets.keys; b <- sets.keys if a < b
    } {
      val exact = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      val e = est((a, b))
      assert(math.abs(e - exact) <= bound,
        s"pair ($a, $b): est $e vs exact $exact exceeds $bound")
    }
    // the construction guarantees A-B overlap far above A-C / B-C
    assert(est(("srcA", "srcB")) > est(("srcA", "srcC")))
    assert(est(("srcA", "srcB")) > est(("srcB", "srcC")))
  }
}
