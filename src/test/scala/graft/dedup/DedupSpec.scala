package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
      (4L, "completely different content about spark engines"),
      (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG")    // case-variant of 1
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups case-insensitive identical docs, min-id survivor") {
    import spark.implicits._
    val r = Dedup.exact(docs, "doc_id", "text")
      .orderBy("survivor_id")
      .as[(String, Long, Long)].collect()
    assert(r.length == 3)
    val bySurvivor = r.map(t => t._2 -> t._3).toMap
    assert(bySurvivor(1L) == 3)   // docs 1, 2, 5 collapse
    assert(bySurvivor(3L) == 1)
    assert(bySurvivor(4L) == 1)
  }

  test("shingles: w-grams; short docs floor at one truncated shingle") {
    import spark.implicits._
    val r = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(split(col("text"), " "), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(r(1L) == Seq("a b c", "b c d"))
    assert(r(2L) == Seq("a b"))
  }

  test("minhash LSH finds the near-dup pair and the exact pair") {
    import spark.implicits._
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dups must share all bands")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      "near dup should collide in at least one band")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("minhash est_jaccard is 1.0 for identical docs") {
    import spark.implicits._
    val est = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash: identical docs identical fingerprints; near dups close") {
    import spark.implicits._
    val fp = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L).length == 16 && fp(1L).forall(c => c == '0' || c == '1'))
    val hamming = fp(1L).zip(fp(3L)).count { case (a, b) => a != b }
    assert(hamming <= 6, s"near-dup hamming was $hamming")
  }

  test("ngram jaccard: exact dup = 1.0; near dup in (0,1); unrelated absent") {
    import spark.implicits._
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.05)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.3 && j((1L, 3L)) < 1.0)
    assert(!j.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containment: the embedded doc scores 1.0 on ITS side; jaccard-low pairs still surface") {
    import spark.implicits._
    // doc 11 is entirely contained in doc 10 (every shingle of 11 appears
    // in 10) but their jaccard is only 3/6 = 0.5 — the doc-in-doc case the
    // symmetric measure under-reports; doc 12 shares nothing
    val df = Seq(
      (10L, "a b c d e f g h"),
      (11L, "a b c d e"),
      (12L, "p q r s t u")
    ).toDF("doc_id", "text")
    val got = Dedup.containment(df, "doc_id", "text", minContainment = 0.8)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq((10L, 11L, 0.5, 1.0)), got.toSeq)
  }

  test("passageDedup: first occurrence survives, later instances drop, docs reassemble") {
    import spark.implicits._
    // w=3 passages; doc 1 = [A][B], doc 2 repeats A then fresh C, doc 3 is
    // entirely doc 1's passages (fully deduped away), doc 4 has a partial
    // last window, doc 5 is empty text
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "a b c d e f"),
      (4L, "p q r s"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.passageDedup(df, "doc_id", "text", passageTokens = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((1L, "a b c d e f", 2L, 0L)), s"doc1: ${got(0)}")
    assert(got(1) == ((2L, "x y z", 2L, 1L)), s"doc2 keeps only its fresh passage: ${got(1)}")
    assert(got(2) == ((3L, "", 2L, 2L)), s"doc3 fully deduped: ${got(2)}")
    assert(got(3) == ((4L, "p q r s", 2L, 0L)), s"doc4 partial window survives: ${got(3)}")
    assert(got(4) == ((5L, "", 1L, 0L)), s"doc5 empty text is one empty passage: ${got(4)}")
  }

  test("passageDedup: repeated passage WITHIN one doc keeps only the first position") {
    import spark.implicits._
    val df = Seq((7L, "a b a b")).toDF("doc_id", "text")
    val got = Dedup.passageDedup(df, "doc_id", "text", passageTokens = 2)
      .head()
    assert(got.getString(1) == "a b" && got.getLong(3) == 1L)
  }

  test("exactSpanDedup: later duplicate spans cut at every alignment, first survives") {
    import spark.implicits._
    // L=3: doc 2 copies doc 1 verbatim (fully removed); doc 3 embeds doc
    // 1's middle run inside fresh text (only the shared run goes); doc 4
    // is short (< L, untouched); doc 5 empty
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "p q b c d e r s"),
      (4L, "x y"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.exactSpanDedup(df, "doc_id", "text", spanWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 6L, 0L, "a b c d e f")), s"doc1: ${got(0)}")
    assert(got(1) == ((2L, 6L, 6L, "")), s"doc2 fully removed: ${got(1)}")
    // doc 3: grams "b c d" and "c d e" duplicate doc 1 -> tokens b..e cut
    assert(got(2) == ((3L, 8L, 4L, "p q r s")), s"doc3: ${got(2)}")
    assert(got(3) == ((4L, 2L, 0L, "x y")), s"doc4 short: ${got(3)}")
    // unicode grain (round 13): empty text = ZERO tokens, not ['']
    assert(got(4) == ((5L, 0L, 0L, "")), s"doc5 empty: ${got(4)}")
  }

  test("exactSpanDedup: within-doc repeat keeps the first occurrence only") {
    import spark.implicits._
    val df = Seq((7L, "a b c x a b c")).toDF("doc_id", "text")
    val got = Dedup.exactSpanDedup(df, "doc_id", "text", spanWords = 3).head()
    assert(got.getString(3) == "a b c x" && got.getLong(2) == 3L, got.toString)
  }

  test("exactSpanDedup viral guard: salted hot path returns identical results") {
    import spark.implicits._
    // 30 docs share one viral 3-gram head; identical output with the
    // guard forced on (maxGramFreq 1) and off
    val docs = (0 until 30).map(i => (i.toLong, s"v i r tail$i end$i"))
      .toDF("doc_id", "text")
    def run(maxFreq: Long) =
      Dedup.exactSpanDedup(docs, "doc_id", "text", spanWords = 3,
          maxGramFreq = maxFreq, salts = 4)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(run(Long.MaxValue) == run(1L))
    // doc 0 keeps the head; every later doc loses exactly the viral window
    val plain = run(Long.MaxValue)
    assert(plain.head._3 == "v i r tail0 end0")
    assert(plain(1) == ((1L, 3L, "tail1 end1")))
  }

  test("exactSpanDedup matches a brute-force reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e")
    val L = 3
    val texts = (0 until 24).map { _ =>
      (0 until (1 + rnd.nextInt(14)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // reference: same policy, independent code path
    val tokd = texts.map(_.trim.split(" ").toSeq)
    val firsts = scala.collection.mutable.Map.empty[Seq[String], (Int, Int)]
    for (d <- tokd.indices; i <- 0 to tokd(d).length - L)
      firsts.getOrElseUpdate(tokd(d).slice(i, i + L), (d, i))
    val want = tokd.zipWithIndex.map { case (t, d) =>
      val cut = (0 to t.length - L)
        .filter(i => firsts(t.slice(i, i + L)) != ((d, i)))
        .flatMap(i => i until i + L).toSet
      (d.toLong, t.indices.filterNot(cut).map(t).mkString(" "))
    }.toMap
    val got = Dedup.exactSpanDedup(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text", spanWords = L)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == want)
  }

  test("ngram jaccard maxDf: a viral shingle is cut from pairs AND counts") {
    import spark.implicits._
    // 40 docs all share the boilerplate head "x y z" (df=40 ≫ cap); each
    // doc's tail is unique except docs 100/101, which share their tails.
    // Uncapped, boilerplate alone creates 40·39/2 candidate pairs; capped,
    // the only surviving pair is the genuinely-near-dup tail pair.
    val viral = (100L until 140L).map { i =>
      val tail = if (i <= 101L) "same tail here friend" else s"tail $i v${i * 7} w${i * 13}"
      (i, s"x y z $tail")
    }.toDF("doc_id", "text")
    val capped = Dedup.ngramJaccard(viral, "doc_id", "text",
        shingleWidth = 3, minJaccard = 0.05, maxDf = 5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(capped.map(p => (p._1, p._2)).toSet == Set((100L, 101L)),
      s"only the tail pair may survive the cap: ${capped.mkString(",")}")
    // denominators must count KEPT shingles only: both docs have 5 shingles,
    // the viral "x y z" cut on each side -> 4 shared of 4 kept = 1.0
    assert(capped.head._3 == 1.0, s"capped jaccard over kept universe: ${capped.head}")
    // and the uncapped run on the same corpus keeps the boilerplate pairs
    val uncapped = Dedup.ngramJaccard(viral, "doc_id", "text",
      shingleWidth = 3, minJaccard = 0.05).count()
    assert(uncapped > 100L, s"uncapped viral corpus must pair broadly: $uncapped")
  }

  test("minhashIncrement: index pairs + increment pairs == full batch over the union") {
    import spark.implicits._
    // corpus with near-dups both inside the increment and across it
    val old = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text about spark shuffles and joins")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // ~doc 1/2
      (11L, "completely different text about spark shuffles and sorts"), // ~doc 3
      (12L, "an unrelated brand new document with fresh words only"),
      (13L, "an unrelated brand new document with fresh words too") // ~doc 12
    ).toDF("doc_id", "text")
    val union = old.unionByName(batch)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "est_jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val full = pairSet(Dedup.minhashCandidates(union, "doc_id", "text"))
    val oldPairs = pairSet(Dedup.minhashCandidates(old, "doc_id", "text"))
    val oldSigs = Dedup.minhashSignatures(old, "doc_id", "text", 12, 3)
    val oldBands = Dedup.lshBands(oldSigs, 12, 2)
    val inc = Dedup.minhashIncrement(batch, "doc_id", "text",
      Some(oldSigs), Some(oldBands))
    val incPairs = pairSet(inc.newPairs)
    assert(incPairs.nonEmpty && (incPairs & oldPairs).isEmpty,
      "the increment must surface only pairs touching the batch")
    assert(oldPairs ++ incPairs == full,
      s"index ∪ increment must equal the full batch:\n old=$oldPairs\n inc=$incPairs\n full=$full")
  }

  test("minhashIncrement: replaying an ingested batch is a no-op") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 12, 3)
    val bands = Dedup.lshBands(sigs, 12, 2)
    val replay = Dedup.minhashIncrement(docs, "doc_id", "text",
      Some(sigs), Some(bands))
    assert(replay.sigs.isEmpty && replay.newPairs.isEmpty,
      "redelivered doc_ids must produce an empty increment")
  }

  test("boilerplateRemove: frequent segments drop EVERYWHERE, rare repeats survive") {
    import spark.implicits._
    // w=3: "h h h" appears in 3 distinct docs (>= minDocFreq) — every
    // instance drops, including doc 1's. "a b c" appears TWICE but only in
    // doc 2 (df=1) — within-doc repetition is not boilerplate and survives
    // both times (the passageDedup contrast). Doc 4 is pure boilerplate.
    val df = Seq(
      (1L, "h h h x y z"),
      (2L, "a b c a b c h h h"),
      (3L, "p q r s"),
      (4L, "h h h")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateRemove(df, "doc_id", "text",
        segTokens = 3, minDocFreq = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((1L, "x y z", 2L, 1L)), s"doc1 sheds the header: ${got(0)}")
    assert(got(1) == ((2L, "a b c a b c", 3L, 1L)),
      s"doc2 keeps its within-doc repeat, sheds the header: ${got(1)}")
    assert(got(2) == ((3L, "p q r s", 2L, 0L)), s"doc3 untouched: ${got(2)}")
    assert(got(3) == ((4L, "", 1L, 1L)), s"doc4 is all boilerplate: ${got(3)}")
  }

  test("boilerplateRemove viral guard: salted hot path returns identical results") {
    import spark.implicits._
    // the boilerplate key IS the viral key: a header shared by 200 docs
    val viral = (0L until 200L).map { i =>
      (i, s"common viral header here unique $i tail ${i * 3}")
    }.toDF("doc_id", "text")
    def run(maxFreq: Long) = Dedup.boilerplateRemove(viral, "doc_id", "text",
        segTokens = 5, minDocFreq = 3, maxSegFreq = maxFreq, salts = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(10L) == run(1L << 20),
      "the skew guard may move work between tasks, never change the result")
    // unlike passageDedup, doc 0 gets NO canonical copy — the 5-token header
    // window "common viral header here unique" is gone from every doc
    val r = run(10L)
    assert(r.head(1) == "0 tail 0", s"header drops everywhere: ${r.head}")
  }

  test("passageDedup viral guard: salted hot path returns identical results") {
    import spark.implicits._
    // one passage repeated across many docs (the viral case) + unique tails
    val viral = (0L until 200L).map { i =>
      (i, s"common viral passage here unique $i tail ${i * 3}")
    }.toDF("doc_id", "text")
    def run(maxFreq: Long) = Dedup.passageDedup(viral, "doc_id", "text",
        passageTokens = 5, maxPassageFreq = maxFreq, salts = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // threshold 10 routes the 200-instance passage through the salted join;
    // threshold 2^20 keeps everything on the plain path — results must match
    assert(run(10L) == run(1L << 20),
      "the skew guard may move work between tasks, never change the result")
    // and the semantics stand: doc 0 keeps everything, every later doc drops
    // exactly its viral first window
    val r = run(10L)
    assert(r.head(1) == "common viral passage here unique 0 tail 0")
    assert(r(5)(3) == 1L, s"doc 5 must drop its viral passage: ${r(5)}")
  }

  test("simhash multi-table: nTables=1 equals simhashPairs; more tables only add") {
    import spark.implicits._
    val corpus = (1L to 60L).map { i =>
      (i, s"token${i % 7} alpha beta${i % 11} gamma delta${i % 5} epsilon zeta${i % 3}")
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val single = pairSet(Dedup.simhashPairs(corpus, "doc_id", "text", 16, 8, 3))
    val multi1 = pairSet(Dedup.simhashPairsMultiTable(corpus, "doc_id", "text", 16, 8, 3, nTables = 1))
    assert(multi1 == single, "one rotation table must reproduce the single-table pairs")
    val multi2 = pairSet(Dedup.simhashPairsMultiTable(corpus, "doc_id", "text", 16, 8, 3, nTables = 2))
    assert(single.subsetOf(multi2),
      "extra tables may only ADD candidates (OR-amplification recall)")
  }

  test("minhash maxBucket: a viral band bucket is skipped, distinct docs still pair") {
    import spark.implicits._
    // 50 identical boilerplate docs (one viral bucket per band) + one true
    // near-dup pair with distinct text
    val viral = ((1L to 50L).map(i => (i, "x y z w v u t s r q p o n m l k")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
        (101L, "alpha beta gamma delta epsilon zeta eta iota")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashCandidates(viral, "doc_id", "text").count()
    assert(uncapped >= 50L * 49 / 2, s"viral bucket must pair quadratically: $uncapped")
    val capped = Dedup.minhashCandidates(viral, "doc_id", "text", maxBucket = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 <= 50L && p._2 <= 50L),
      s"capped run must skip the viral bucket: $capped")
    assert(capped.contains((100L, 101L)),
      s"distinct near-dups must still pair under the cap: $capped")
  }

  test("connectedComponents closes a long chain that bounded label propagation cannot") {
    import spark.implicits._
    // a 30-node path: diameter 29, far beyond 3 label-propagation rounds
    val chainDocs = (1L to 30L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val chainPairs = (1L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(chainPairs, chainDocs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L), s"one component labeled 1: $cc")
    val lp = Dedup.labelPropagationClusters(chainPairs, chainDocs, "doc_id", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(lp.values.toSet.size > 1,
      "3-round label propagation must under-merge the chain (the gap CC closes)")
  }

  test("incremental CC: merges touched components, freezes the rest, admits new docs") {
    import spark.implicits._
    // existing labeling: {1,2,3} rooted at 1, {10,11} rooted at 10, {20}
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("doc_id", "cluster_id")
    // increment: bridge the two big components and attach a NEVER-SEEN doc
    // 30 to component 10; component {20} is untouched
    val newPairs = Seq((3L, 11L), (30L, 10L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponentsIncremental(labels, newPairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      30L -> 1L, 20L -> 20L), s"got $got")
  }

  test("incremental CC: empty-overlap increment leaves every old label frozen") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("doc_id", "cluster_id")
    // increment touches only brand-new docs — old components pass through
    val newPairs = Seq((100L, 101L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponentsIncremental(labels, newPairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 100L -> 100L, 101L -> 100L),
      s"got $got")
  }

  test("candidate generators release their persisted intermediates (no cache leak)") {
    // Regression guard: each generator persists fat intermediates (signature/
    // band/shingle/fingerprint tables) and must release them once the compact
    // result is materialized — a leak here evicts the shared table cache in
    // long sessions. The checkpointed result itself may add ONE storage entry.
    def cachedCount: Int = spark.sparkContext.getPersistentRDDs.size
    val before = cachedCount
    val results = Seq(
      Dedup.minhashCandidates(docs, "doc_id", "text"),
      Dedup.simhashPairs(docs, "doc_id", "text"),
      Dedup.simhashPairsMultiTable(docs, "doc_id", "text"),
      Dedup.ngramJaccard(docs, "doc_id", "text"),
      Dedup.passageDedup(docs, "doc_id", "text"))
    results.foreach(_.count())
    val after = cachedCount
    assert(after - before <= results.size,
      s"persisted RDDs grew $before -> $after: an intermediate leaked past " +
        "its materializeAndRelease point")
  }

  test("simhashPrefixBitsFor keeps expected occupancy constant as the corpus grows") {
    // the fixed-width trap the full-suite 10x probe measured: at 8 prefix
    // bits, 10x the corpus means 10x the occupancy and ~100x the pair
    // work; the sizing rule widens the prefix instead
    def occ(n: Long, bits: Int) = n.toDouble / (1L << Dedup.simhashPrefixBitsFor(n, 64, bits))
    Seq(10_000L, 100_000L, 1_000_000L, 100_000_000L).foreach { n =>
      val o = occ(n, 48)
      assert(o > 32 && o <= 64, s"n=$n occupancy $o must stay in (target/2, target]")
    }
    // clamped to the usable bit range
    assert(Dedup.simhashPrefixBitsFor(10L, 64, 16) == 1)
    assert(Dedup.simhashPrefixBitsFor(Long.MaxValue / 4, 1, 16) == 15)
    // and the graded 16/8 layout is exactly what the rule picks at its
    // design occupancy: 2^8 buckets x 64 docs/bucket = 16k docs
    assert(Dedup.simhashPrefixBitsFor(16_384L, 64, 16) == 8)
  }
}
