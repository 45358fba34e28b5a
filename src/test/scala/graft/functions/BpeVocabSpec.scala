package graft.functions

import graft.SparkSpec

class BpeVocabSpec extends SparkSpec {

  import spark.implicits._

  // ---- independent in-JVM reference BPE trainer ----
  // symbol lists, greedy left-to-right merge, tie-break on (count desc,
  // rendered "(a)(b)" pair string asc) — the engine's exact contract
  private def refTrain(words: Seq[(String, Long)],
                       nMerges: Int): Seq[(String, String, Long)] = {
    def render(a: String, b: String) = s"($a)($b)"
    var vocab: Vector[(List[String], Long)] =
      words.map { case (w, c) => (w.toList.map(_.toString), c) }.toVector
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var rounds = 0
    var done = false
    while (rounds < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, render(x, y)) }
        out += ((render(a, b), a + b, c))
        def applyMerge(syms: List[String]): List[String] = syms match {
          case x :: y :: rest if x == a && y == b => (a + b) :: applyMerge(rest)
          case x :: rest => x :: applyMerge(rest)
          case Nil => Nil
        }
        vocab = vocab.map { case (s, n) => (applyMerge(s), n) }
        rounds += 1
      }
    }
    out.toSeq
  }

  private def engineTrain(words: Seq[(String, Long)],
                          nMerges: Int): Seq[(String, String, Long)] =
    BpeVocab.train(words.toDF("word", "wc"), nMerges)
      .map(m => (m.pair, m.merged, m.pair_count))

  test("greedy left-to-right merge: [a,a,a,a] becomes [aa,aa], not [aa,a,a]") {
    // one word "aaaa" ×3: round 1 merges (a)(a) with count 3·3 = 9
    // occurrences counted pairwise, then the WORD holds [aa, aa] — so
    // round 2's top pair is (aa)(aa), which only exists under correct
    // non-overlapping greedy application
    val got = engineTrain(Seq(("aaaa", 3L)), 3)
    assert(got(0) == ("(a)(a)", "aa", 9L), got)
    assert(got(1) == ("(aa)(aa)", "aaaa", 3L), got)
    assert(got.length == 2, s"single-symbol words have no pairs left: $got")
  }

  test("merged symbols never match inside longer symbols") {
    // after merging (a)(b), the word "cab" holds [c, ab] — pair (c)(ab) —
    // while "ab" is exhausted; a naive substring merge would corrupt "cab"
    val got = engineTrain(Seq(("ab", 5L), ("cab", 2L)), 2)
    assert(got(0) == ("(a)(b)", "ab", 7L), got)
    assert(got(1) == ("(c)(ab)", "cab", 2L), got)
  }

  test("early stop when the vocabulary runs out of pairs") {
    val got = engineTrain(Seq(("ab", 1L)), 5)
    assert(got == Seq(("(a)(b)", "ab", 1L)))
  }

  test("learned merges equal the in-JVM reference on pseudo-random corpora") {
    // small alphabet forces ties, repeats, and overlapping runs
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val words = (1 to 25).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString,
          (1 + rnd.nextInt(5)).toLong)
      }.distinctBy(_._1)
      val want = refTrain(words, 6)
      val got = engineTrain(words, 6)
      assert(got == want, s"trial $trial: corpus $words")
    }
  }

  // reference encoder: replay merges in training order, greedy
  // left-to-right — the encode contract tokensCol must match
  private def refEncode(word: String,
                        merges: Seq[(String, String, Long)]): List[String] = {
    var syms = word.toList.map(_.toString)
    merges.foreach { case (pair, merged, _) =>
      val Array(a, b) = pair.stripPrefix("(").stripSuffix(")").split("\\)\\(")
      def applyMerge(s: List[String]): List[String] = s match {
        case x :: y :: rest if x == a && y == b => merged :: applyMerge(rest)
        case x :: rest => x :: applyMerge(rest)
        case Nil => Nil
      }
      syms = applyMerge(syms)
    }
    syms
  }

  test("tokensCol: encode replays the merges — equals the reference encoder") {
    val rnd = new scala.util.Random(11)
    val trainWords = (1 to 25).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString,
        (1 + rnd.nextInt(5)).toLong)
    }.distinctBy(_._1)
    val merges = BpeVocab.train(trainWords.toDF("word", "wc"), 6)
    val raw = merges.map(m => (m.pair, m.merged, m.pair_count))
    // encode BOTH seen and unseen words (an encoder must be total)
    val applyWords = trainWords.map(_._1) ++ Seq("abcba", "ccc", "b")
    val got = applyWords.toDF("word")
      .select($"word",
        BpeVocab.tokensCol($"word", merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    applyWords.foreach { w =>
      assert(got(w) == refEncode(w, raw), s"word '$w': ${got(w)}")
    }
  }

  test("tokensCol: merged pair becomes one token, longer symbols untouched") {
    val merges = BpeVocab.train(
      Seq(("ab", 5L), ("cab", 2L)).toDF("word", "wc"), 1)
    val got = Seq("ab", "cab", "bab").toDF("word")
      .select($"word", BpeVocab.tokensCol($"word", merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("ab") == Seq("ab"))
    assert(got("cab") == Seq("c", "ab"))
    assert(got("bab") == Seq("b", "ab"))
  }

  test("native encode equals the replace-fold reference on trained merges") {
    val rnd = new scala.util.Random(13)
    val trainWords = (1 to 30).map { _ =>
      val len = 1 + rnd.nextInt(9)
      (Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString,
        (1 + rnd.nextInt(5)).toLong)
    }.distinctBy(_._1)
    val merges = BpeVocab.train(trainWords.toDF("word", "wc"), 8)
    val applyWords = trainWords.map(_._1) ++ Seq("abcba", "ccc", "b", "")
    val rows = applyWords.toDF("word")
      .select(
        BpeVocab.encodedCol($"word", merges).as("native"),
        BpeVocab.encodedColFold($"word", merges).as("fold"))
      .as[(String, String)].collect()
    rows.foreach { case (n, f) => assert(n == f, s"native '$n' != fold '$f'") }
  }

  test("native encode follows REPLAY, not rank-greedy, when a later merge recreates an earlier pair") {
    // hand-built list (a trainer can't emit it; the apply contract still
    // must match the fold): rank 0 ("aa","b") matches nothing in "aab"
    // until rank 1 ("a","a") creates the "aa" symbol — replay's cursor
    // has moved past rank 0 by then, so the result stays [aa, b].
    // A rank-greedy encoder would apply rank 0 afterwards → [aab]. The
    // replace-fold is replay by construction; native must agree with it.
    val merges = Seq(
      BpeVocab.Merge(1L, "(aa)(b)", "aab", 0L),
      BpeVocab.Merge(2L, "(a)(a)", "aa", 0L))
    val rows = Seq("aab").toDF("word")
      .select(
        BpeVocab.tokensCol($"word", merges).as("toks"),
        BpeVocab.encodedCol($"word", merges).as("native"),
        BpeVocab.encodedColFold($"word", merges).as("fold"))
      .as[(Seq[String], String, String)].collect()
    val (toks, native, fold) = rows.head
    assert(native == fold, s"native '$native' != fold '$fold'")
    assert(toks == Seq("aa", "b"), s"replay must NOT re-fire rank 0: $toks")
  }

  test("encode at 5000 merges analyzes, compiles and runs (the fold's plan-depth ceiling)") {
    // production vocabularies carry 30k-50k merges; the fold form blows
    // the analyzer stack well before that. The native expression holds
    // the table in ONE node — prove a 5000-entry table flows through
    // analysis + codegen + execution, with both an EARLY (rank 0) and a
    // LATE (last rank) merge actually firing.
    def b26(i: Int): String = {
      var n = i; val sb = new StringBuilder
      do { sb.append(('a' + n % 26).toChar); n /= 26 } while (n > 0)
      sb.result()
    }
    val fillers = (1 until 4999).map(i =>
      BpeVocab.Merge(i + 1L, s"(zz)(z${b26(i)})", "zz" + "z" + b26(i), 0L))
    val merges =
      BpeVocab.Merge(1L, "(a)(b)", "ab", 0L) +:
      fillers :+
      BpeVocab.Merge(5000L, "(ab)(ab)", "abab", 0L)
    assert(merges.size == 5000)
    val got = Seq("abab", "zab").toDF("word")
      .select($"word", BpeVocab.tokensCol($"word", merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("abab") == Seq("abab"), got) // rank 0 then rank 4999 fired
    assert(got("zab") == Seq("z", "ab"), got)
  }

  test("unicode corpus: training + encode work over CJK symbols end-to-end") {
    // the [a-z] extractor would DROP every one of these words; the
    // unicode word table trains through the same rounds, and the in-JVM
    // reference (char-grain, script-agnostic) pins the semantics
    val words = Seq(("你好", 5L), ("你好吗", 3L), ("再见", 2L), ("好吗", 4L))
    val want = refTrain(words, 3)
    val got = engineTrain(words, 3)
    assert(got == want, s"CJK training must match the reference: $got vs $want")
    val merges = BpeVocab.train(words.toDF("word", "wc"), 3)
    val toks = Seq("你好吗", "再见你").toDF("word")
      .select($"word", BpeVocab.tokensCol($"word", merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    toks.foreach { case (w, ts) =>
      assert(ts == refEncode(w, want), s"word '$w': $ts vs ${refEncode(w, want)}")
    }
  }

  test("wordCountsUnicode: NFKC + letter/digit runs, lowercased; [a-z] extractor drops them") {
    val docs = Seq((1L, "你好、世界！ Ｈｅｌｌｏ x² 你好")).toDF("doc_id", "text")
    val uni = BpeVocab.wordCountsUnicode(docs, "text")
      .as[(String, Long)].collect().toMap
    // ideograph runs split at punctuation; full-width Ｈｅｌｌｏ NFKCs to
    // hello; x² NFKCs to x2 (one letter+digit run)
    assert(uni == Map("你好" -> 2L, "世界" -> 1L, "hello" -> 1L, "x2" -> 1L), uni)
    val legacy = BpeVocab.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(legacy == Map("x" -> 1L), s"the [a-z] extractor sees almost nothing: $legacy")
  }

  test("wordCounts lowercases and keeps only [a-z]+ runs") {
    val docs = Seq((1L, "Hello, WORLD 42 hello!")).toDF("doc_id", "text")
    val got = BpeVocab.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got == Map("hello" -> 2L, "world" -> 1L))
  }

  test("local and distributed training paths are merge-for-merge identical") {
    // ties (both 'ab' and 'bc' pair masses equal), CJK symbols, words
    // that fully merge (single-symbol early exhaustion pressure), and a
    // word repeated enough to dominate later rounds
    val words = Seq(
      ("abc", 3L), ("abd", 3L), ("bcd", 3L),
      ("你好你好", 2L), ("aaaa", 4L), ("xy", 1L))
    val df = words.toDF("word", "wc")
    val distributed = BpeVocab.trainInner(df, nMerges = 6)
    val local = BpeVocab.trainLocal(words, nMerges = 6)
    assert(local == distributed,
      s"paths diverged:\nlocal:       $local\ndistributed: $distributed")
    // and the dispatching front door takes the local path here (tiny
    // vocabulary) yet returns the same artifact
    assert(BpeVocab.train(df, nMerges = 6) == distributed)
  }
}
