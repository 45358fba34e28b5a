package graft.dedup

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** Winnowing vs an independent in-JVM reference (hash → frames →
  * rightmost-min → dedup), plus the SIGMOD-2003 guarantee: any shared
  * token run of ≥ window + k − 1 tokens yields a shared fingerprint. */
class WinnowingSpec extends SparkSpec with TableDrivenPropertyChecks {

  // ---- independent reference implementation (no shared code paths) ----

  private def md5Half56(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 7).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  private def refShingles(toks: Seq[String], w: Int): Seq[String] = {
    val count = math.max(toks.length - (w - 1), 1)
    (0 until count).map(i => toks.slice(i, math.min(i + w, toks.length)).mkString(" "))
  }

  private def refWinnow(toks: Seq[String], w: Int, v: Int): Seq[(Int, Long)] = {
    val hs = refShingles(toks, w).map(md5Half56)
    val frames = math.max(hs.length - (v - 1), 1)
    val sel = (0 until frames).map { f =>
      val frame = hs.zipWithIndex.slice(f, math.min(f + v, hs.length))
      // rightmost minimal hash
      frame.minBy { case (h, pos) => (h, -pos) }._2
    }
    sel.distinct.map(p => (p, hs(p)))
  }

  private def fpOf(texts: Seq[String], w: Int, v: Int) = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Winnowing.fingerprints(docs, "doc_id", "text", w, v)
      .as[(Long, Int, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3))).toMap
  }

  test("matches the reference on deterministic pseudo-random docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val texts = (0 until 30).map { _ =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    forEvery(Table(("w", "v"), (3, 4), (2, 5), (1, 3), (4, 1))) { (w, v) =>
      val got = fpOf(texts, w, v)
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = refWinnow(t.trim.split(" ").toSeq, w, v)
        assert(got(i.toLong) == want, s"doc $i, w=$w v=$v")
      }
    }
  }

  test("positions are strictly increasing and every doc has >= 1 fingerprint") {
    val rnd = new scala.util.Random(7)
    val texts = (0 until 25).map { _ =>
      val n = 1 + rnd.nextInt(12) // mostly shorter than window+shingle
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar.toString).mkString(" ")
    } :+ "" :+ "single"
    val got = fpOf(texts, 3, 4)
    texts.indices.foreach { i =>
      val fps = got.getOrElse(i.toLong, Nil)
      assert(fps.nonEmpty, s"doc $i has no fingerprint")
      assert(fps.map(_._1) == fps.map(_._1).sorted.distinct, s"doc $i positions")
    }
  }

  test("guarantee: a shared run of window+k-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("p", "q", "r", "s", "t", "u", "v", "w", "x", "y")
    val (w, v) = (3, 4)
    val run = (0 until (v + w - 1)).map(i => s"run$i") // t = 6 shared tokens
    (0 until 10).foreach { trial =>
      def noise(n: Int) = (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
      val docA = (noise(rnd.nextInt(20)) ++ run ++ noise(rnd.nextInt(20))).mkString(" ")
      val docB = (noise(rnd.nextInt(20)) ++ run ++ noise(rnd.nextInt(20))).mkString(" ")
      val got = fpOf(Seq(docA, docB), w, v)
      val shared = got(0L).map(_._2).toSet intersect got(1L).map(_._2).toSet
      assert(shared.nonEmpty, s"trial $trial: guarantee violated\nA=$docA\nB=$docB")
    }
  }

  test("matches: shared-count, threshold, and df cap") {
    import spark.implicits._
    val fps = Seq(
      // docs 1,2 share h=10,11,12 (3 shared); doc 3 shares only h=10 with
      // them; h=99 is in every doc (df 4) and must be cut at maxDf 3
      (1L, 0, 10L), (1L, 2, 11L), (1L, 4, 12L), (1L, 6, 99L),
      (2L, 1, 10L), (2L, 3, 11L), (2L, 5, 12L), (2L, 7, 99L),
      (3L, 0, 10L), (3L, 2, 99L),
      (4L, 0, 99L), (4L, 1, 11L), (4L, 2, 11L), // dup (doc,h) counts once
    ).toDF("doc_id", "pos", "h")
    val got = Winnowing.matchesFromFingerprints(fps, minShared = 2, maxDf = 3)
      .as[(Long, Long, Long)].collect().toSet
    // h=99 cut (df 4); h=10 df 2, h=11 df 3, h=12 df 2 survive: (1,2)
    // shares {10,11,12}; every other pair shares at most one hash
    assert(got == Set((1L, 2L, 3L)))
  }
}
