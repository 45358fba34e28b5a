package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SlidingChunksSpec extends SparkSpec {

  private def chunksOf(texts: Seq[String], size: Int, stride: Int) = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    SlidingChunks.chunks(docs, "doc_id", "text", size, stride)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq.groupBy(_._1)
  }

  test("layout: count formula, coverage, overlap, short docs") {
    val texts = Seq(
      (1 to 20).map(i => s"t$i").mkString(" "), // 20 toks: 3 chunks at 8/6
      (1 to 8).map(i => s"t$i").mkString(" "),  // exactly one window
      (1 to 9).map(i => s"t$i").mkString(" "),  // 2 chunks, tail len 3
      "short",                                   // 1 token
      "")                                        // empty -> 0 unicode tokens
    val got = chunksOf(texts, 8, 6)
    // doc 0: starts 0,6,12 -> n_tokens 8,8,8
    assert(got(0L).map(c => (c._3, c._4)) == Seq((0L, 8L), (6L, 8L), (12L, 8L)))
    // doc 1: single full window
    assert(got(1L) == Seq((1L, 0L, 0L, 8L)))
    // doc 2: 9 tokens -> chunks at 0 (8 toks) and 6 (3 toks)
    assert(got(2L).map(c => (c._3, c._4)) == Seq((0L, 8L), (6L, 3L)))
    // docs 3,4: one short chunk each (the empty doc's chunk holds zero
    // tokens under the round-13 unicode grain)
    assert(got(3L) == Seq((3L, 0L, 0L, 1L)))
    assert(got(4L) == Seq((4L, 0L, 0L, 0L)))
    // coverage: every token index of doc 0 falls inside >= 1 chunk
    val covered = got(0L).flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 20L).toSet)
  }

  test("chunk hash equals the hash of the reconstructed token slice") {
    import spark.implicits._
    val text = (1 to 15).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val got = SlidingChunks.chunks(docs, "doc_id", "text", 8, 6)
      .select("start_tok", "n_tokens", "chunk_hash")
      .as[(Long, Long, Long)].collect().toMap2
    val toks = text.split(" ")
    got.foreach { case (start, (nTok, hash)) =>
      val expectText = toks.slice(start.toInt, (start + nTok).toInt).mkString(" ")
      val expect = Seq(expectText).toDF("s")
        .select(graft.dedup.Dedup.hexHash(col("s"))).head().getLong(0)
      assert(hash == expect, s"chunk at $start")
    }
  }

  test("stride > size or zero stride is rejected") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SlidingChunks.chunks(docs, "doc_id", "text", 4, 5)
    }
    intercept[IllegalArgumentException] {
      SlidingChunks.chunks(docs, "doc_id", "text", 4, 0)
    }
  }

  private implicit class Tup3Ops(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
