package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContentChunksSpec extends SparkSpec {

  private val W = 3
  private val D = 4 // small divisor → dense boundaries at test scale

  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(("cdc|" + s).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  /** Independent reference: same boundary rule, plain Scala. Returns
    * (chunk_idx, start_tok, n_tok, chunk_hash) per doc. */
  private def reference(text: String): Seq[(Long, Long, Long, Long)] = {
    // the engine's default (unicode) token grain: an empty doc has ZERO
    // tokens and still yields exactly one (empty) chunk
    val t = "[\\p{L}\\p{N}]+".r.findAllIn(text).toSeq
    val n = t.length
    val interior = (W to n - 1).filter { i =>
      h56(t.slice(i - W, i).mkString(" ")) % D == 0
    }
    val bounds = 0 +: interior :+ n
    bounds.sliding(2).zipWithIndex.map { case (Seq(a, b), j) =>
      ((j + 1).toLong, (a + 1).toLong, (b - a).toLong,
        h56(t.slice(a, b).mkString(" ")))
    }.toSeq
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, Long, Long)]] = {
    import spark.implicits._
    ContentChunks.chunks(docs.toDF("doc_id", "text"), "doc_id", "text", W, D)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5)).toSeq).toMap
  }

  private val sample = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
    (2L, "one two three"),   // == window: single chunk
    (3L, "solo"),            // 1 token
    (4L, ""))                // empty text → one empty-string token

  test("matches the independent in-JVM reference on every doc shape") {
    val got = run(sample)
    sample.foreach { case (id, tx) =>
      assert(got(id) == reference(tx), s"doc $id")
    }
  }

  test("chunks tile the doc exactly: starts/lengths reassemble the token stream") {
    run(sample).foreach { case (id, chunks) =>
      val n = "[\\p{L}\\p{N}]+".r
        .findAllIn(sample.find(_._1 == id).get._2).length
      assert(chunks.head._2 == 1L)
      assert(chunks.map(_._3).sum == n.toLong, s"doc $id lengths must sum to $n")
      chunks.sliding(2).foreach {
        case Seq(a, b) => assert(b._2 == a._2 + a._3, s"doc $id contiguous")
        case _ =>
      }
    }
  }

  test("shift invariance: a prefix insertion re-finds the interior chunks (fixed windows cannot)") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town tonight again and again"
    val shifted = "INSERTED " + base
    val got = run(Seq((1L, base), (2L, shifted)))
    val h1 = got(1L).map(_._4).toSet
    val h2 = got(2L).map(_._4).toSet
    // every chunk of the original except (at most) the first — whose
    // content now differs by the inserted prefix — must reappear verbatim
    // in the shifted doc despite every token position moving by one
    val interior = got(1L).drop(1).map(_._4).toSet
    assert(interior.nonEmpty, "test needs at least two chunks to be meaningful")
    assert(interior.subsetOf(h2),
      s"interior chunks must survive the shift: ${interior -- h2} lost\n$h1\n$h2")
  }

  test("duplicatedChunks finds cross-doc repeats and nothing else") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared passage of considerable length here unique tail one"),
      (2L, "different head text then shared passage of considerable length here"),
      (3L, "wholly unrelated content with no repeats at all")).toDF("doc_id", "text")
    val ch = ContentChunks.chunks(docs, "doc_id", "text", W, D)
    val dup = ContentChunks.duplicatedChunks(ch)
      .as[(Long, Long, Long, Long)].collect()
    // every reported hash really occurs >1 times in the chunk table
    val counts = ch.groupBy("chunk_hash").count()
      .as[(Long, Long)].collect().toMap
    dup.foreach { case (h, copies, docsN, firstDoc) =>
      assert(counts(h) == copies && copies > 1)
      assert(docsN >= 1 && firstDoc >= 1)
    }
    // and no qualifying hash is missed
    assert(dup.map(_._1).toSet == counts.filter(_._2 > 1).keySet)
  }

  // ---- max-chunk cap (round 13): the adversarial boundary-free run ----

  test("maxLen caps a boundary-free adversarial doc; uncapped it is one whole-doc chunk") {
    import spark.implicits._
    // 'zq zq zq …': every interior window is the SAME string, whose 56-bit
    // hash is 3 mod 8 — the residue class is never hit, so content-defined
    // boundaries alone never fire (verified by the uncapped branch below).
    // This is precisely the input that made the uncapped operator assemble
    // an unbounded per-row chunk.
    val docs = Seq((1L, Seq.fill(60)("zq").mkString(" "))).toDF("doc_id", "text")
    def chunkShape(maxLen: Int): Seq[(Long, Long)] =
      ContentChunks.chunks(docs, "doc_id", "text", window = 3, divisor = 8,
          maxLen = maxLen)
        .select(col("start_tok"), col("n_tok"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(chunkShape(Int.MaxValue) == Seq((1L, 60L)),
      "uncapped: the boundary-free doc must be ONE 60-token chunk")
    // cap 24: forced boundaries at 24 and 48 → 24, 24, 12
    assert(chunkShape(24) == Seq((1L, 24L), (25L, 24L), (49L, 12L)))
  }

  test("the cap only subdivides over-long gaps — content-anchored chunks are untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared passage of considerable length here unique tail one"),
      (2L, "different head text then shared passage of considerable length here"))
      .toDF("doc_id", "text")
    def all(maxLen: Int) =
      ContentChunks.chunks(docs, "doc_id", "text", W, D, maxLen = maxLen)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // a cap far above every gap is a no-op: byte-identical chunk tables
    assert(all(64) == all(Int.MaxValue))
    // a tight cap never yields a chunk above it, and every forced cut is
    // a multiple of the cap within its gap
    val capped = all(2)
    assert(capped.forall(_._4 <= 2L), capped)
    // token coverage is preserved: per-doc n_tok sums match the uncapped run
    def perDocTokens(rows: Seq[(Long, Long, Long, Long, Long)]): Map[Long, Long] =
      rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perDocTokens(capped) == perDocTokens(all(Int.MaxValue)))
  }
}
