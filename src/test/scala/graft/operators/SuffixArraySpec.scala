package graft.operators

import graft.SparkSpec

class SuffixArraySpec extends SparkSpec {

  // ---- independent in-JVM reference: sort the suffixes outright ----

  private val seqOrd = new Ordering[Seq[String]] {
    def compare(x: Seq[String], y: Seq[String]): Int = {
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = x(i).compareTo(y(i))
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** (doc_id, widx) -> (srank, spos) by brute-force suffix sort, at the
    * engine's default (unicode) token grain — an empty or token-free doc
    * contributes no suffixes. */
  private def reference(docs: Seq[(Long, String)])
      : Map[(Long, Long), (Long, Long)] = {
    val sfx = for {
      (id, tx) <- docs
      t = "[\\p{L}\\p{N}]+".r.findAllIn(tx).toSeq
      i <- 1 to t.length
    } yield (id, i.toLong, t.drop(i - 1))
    val sorted = sfx.sortBy { case (id, i, s) => (s, id, i) }(
      Ordering.Tuple3(seqOrd, implicitly, implicitly))
    val spos = sorted.zipWithIndex
      .map { case ((id, i, s), k) => (id, i, s, k + 1L) }
    val minBySfx = spos.groupBy(_._3).view.mapValues(_.map(_._4).min).toMap
    spos.map { case (id, i, s, k) => (id, i) -> ((minBySfx(s), k)) }.toMap
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "the cat sat on the mat"), // exact dup of doc 1: every suffix ties
    (4L, "zebra"),                  // 1-word doc
    (5L, ""),                       // empty text: NO tokens (unicode grain)
    (6L, "on the mat on the mat"),  // internal repetition
    // tab-separated tokens: the unicode grain splits at the tab (tab is
    // neither letter nor digit) — the sub-space-joiner contract is the
    // LEGACY grain's business, tested separately below
    (7L, "a\tb c"),
    (8L, "a z")
  )

  private def run() = {
    import spark.implicits._
    SuffixArray.suffixRanks(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
  }

  test("suffix ranks match the brute-force reference (dups, empties, repetition)") {
    assert(run() == reference(corpus))
  }

  test("srank ties exactly on identical suffixes; spos is a permutation") {
    val got = run()
    // docs 1 and 3 are verbatim dups: every aligned suffix pair must tie
    (1L to 6L).foreach { i =>
      assert(got((1L, i))._1 == got((3L, i))._1, s"widx $i must tie")
    }
    // doc 2 diverges from doc 1 at its last word: the suffix STARTING at
    // the divergence must not tie
    assert(got((1L, 6L))._1 != got((2L, 6L))._1)
    val all = got.values.map(_._2).toSeq
    assert(all.sorted == (1L to all.length).toSeq, "spos must be 1..n")
  }

  test("NUL joiner: sub-space characters inside LEGACY tokens rank element-wise") {
    import spark.implicits._
    // tokens holding a sub-space character (tab) exist only at the legacy
    // whitespace grain: element-wise word order puts ["a","z"] BEFORE
    // ["a\tb","c"] ("a" is a proper prefix of "a\tb") — a space-joined
    // ranking key would invert this ('\t' < ' '), the NUL joiner must not
    val docs = Seq((7L, "a\tb c"), (8L, "a z")).toDF("doc_id", "text")
    val got = SuffixArray.suffixRanks(docs, "doc_id", "text",
        tok = graft.functions.TextAnalysis.tokens)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got((8L, 1L)) < got((7L, 1L)),
      s"""["a","z"] must sort before ["a\tb","c"]: $got""")
  }

  test("repeatedSpans surfaces the verbatim repeated run with its true LCP") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zz alpha beta gamma delta qq"),
      (3L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val top = SuffixArray.repeatedSpans(docs, "doc_id", "text",
        window = 8, topK = 3)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    // the longest shared run is "alpha beta gamma delta " — 23 chars
    // INCLUDING the joining space before the divergent words (char-grain
    // LCP of the space-joined windows; the oracle counts identically)
    val best = top.head
    assert(best._5 == 23L, s"lcp: $best")
    assert(best._6 == "alpha beta gamma delta ", s"prefix: $best")
    assert(Set(best._1 -> best._2, best._3 -> best._4) ==
      Set(1L -> 1L, 2L -> 2L), s"pair: $best")
  }

  test("crossSourceSpans: only cross-boundary pairs; the planted overlap surfaces") {
    import spark.implicits._
    val docs = Seq(
      (0L, "held out alpha beta gamma delta"),    // held-out (id % 97 == 0)
      (2L, "corpus alpha beta gamma delta text"), // shares the span with 0
      (3L, "xx yy zz ww vv uu tt"),
      (4L, "xx yy zz ww vv uu ss")                // long corpus-only overlap
    ).toDF("doc_id", "text")
    val ranks = SuffixArray.suffixRanks(docs, "doc_id", "text")
    val got = SuffixArray.crossSourceSpans(ranks, docs, "doc_id", "text",
        isHeldOut = _ % 97 === 0, window = 8, topK = 10)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    // every reported pair crosses the boundary — the 6-word corpus-only
    // overlap between docs 3 and 4 must NOT appear
    got.foreach { r =>
      assert((r._1 % 97 == 0) != (r._3 % 97 == 0), s"not cross-source: $r")
    }
    val best = got.head
    assert(best._6 == "alpha beta gamma delta", s"planted span: $best")
    assert(Set(best._1, best._3).contains(0L) &&
      Set(best._1, best._3).contains(2L), s"pair: $best")
  }

  test("round count is logarithmic in doc length (early exit on distinct ranks)") {
    import spark.implicits._
    // 40 distinct words: ranks separate after the first-word round only if
    // all words distinct — here they are, so construction must finish
    // without erroring and rank 1..40 uniquely
    val words = (1 to 40).map(i => f"w$i%02d").mkString(" ")
    val got = SuffixArray.suffixRanks(Seq((9L, words)).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 40)
    assert(got.map(_._3).sorted.toSeq == (1L to 40L), "all ranks distinct")
  }
}
