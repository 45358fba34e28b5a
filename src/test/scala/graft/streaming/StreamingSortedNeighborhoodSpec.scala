package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSortedNeighborhoodSpec extends SparkSpec {

  // near-dup pairs share long prefixes; blocks are the first 4 chars
  private val corpus: Seq[(Long, String)] = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zetb"),   // near-dup of 1
    (3L, "alpha beta completely different tail here"),
    (4L, "bravo charlie delta echo foxtrot golf"),
    (5L, "bravo charlie delta echo foxtrot gulf"),  // near-dup of 4
    (6L, "charlie delta echo"),
    (7L, "alpha beta gamma delta epsilon zetc"),   // wedges between 1 and 2
    (8L, "bravo charlie delta echo foxtrot golf"), // exact dup of 4
    (9L, "delta echo foxtrot"),
    (10L, "alpha beta gamma delta epsilon zeta extra"))

  private val Block = 4
  private val Pfx = 30
  private val MaxDist = 6

  private def toDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchPairs(upTo: Int) = pairsOf(
    StreamingSortedNeighborhood.candidates(
      StreamingSortedNeighborhood.blocked(toDf(corpus.take(upTo)), Block, Pfx),
      MaxDist))

  test("accumulated candidates contain the batch run at every fold point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("sn-ckpt").toString
    val (q, handle) = StreamingSortedNeighborhood.start(
      input.toDF().toDF("doc_id", "text"), ckpt, Block, Pfx, MaxDist)
    Seq(4, 7, 10).foldLeft(0) { (prev, upTo) =>
      input.addData(corpus.slice(prev, upTo): _*)
      q.processAllAvailable()
      val streamed = pairsOf(handle.currentPairs.get)
      val batch = batchPairs(upTo)
      assert(batch.subsetOf(streamed),
        s"at fold $upTo, missing: ${batch -- streamed}")
      // every streamed pair is a genuine below-threshold prefix pair
      assert(streamed.forall { case (a, b) => a < b })
      upTo
    }
    q.stop()
  }

  test("replayed docs are dropped by the index guard") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("sn-ckpt2").toString
    val (q, handle) = StreamingSortedNeighborhood.start(
      input.toDF().toDF("doc_id", "text"), ckpt, Block, Pfx, MaxDist)
    input.addData(corpus.take(7): _*)
    q.processAllAvailable()
    val before = pairsOf(handle.currentPairs.get)
    val idxBefore = handle.currentIndex.get.count()
    input.addData(corpus.take(7): _*) // full redelivery
    q.processAllAvailable()
    assert(pairsOf(handle.currentPairs.get) == before)
    assert(handle.currentIndex.get.count() == idxBefore)
    q.stop()
  }

  test("seeded restart continues from persisted index + pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("sn-ckpt3").toString
    val (q, handle) = StreamingSortedNeighborhood.start(
      input.toDF().toDF("doc_id", "text"), ckpt, Block, Pfx, MaxDist)
    input.addData(corpus.take(6): _*)
    q.processAllAvailable()
    val (pIdx, pPairs) = (handle.currentIndex.get, handle.currentPairs.get)
    q.stop()

    val input2 = MemoryStream[(Long, String)]
    val ckpt2 = java.nio.file.Files.createTempDirectory("sn-ckpt4").toString
    val (q2, handle2) = StreamingSortedNeighborhood.start(
      input2.toDF().toDF("doc_id", "text"), ckpt2, Block, Pfx, MaxDist,
      initialIndex = Some(pIdx), initialPairs = Some(pPairs))
    input2.addData(corpus.drop(6): _*)
    q2.processAllAvailable()
    val streamed = pairsOf(handle2.currentPairs.get)
    q2.stop()
    assert(batchPairs(10).subsetOf(streamed))
  }
}
