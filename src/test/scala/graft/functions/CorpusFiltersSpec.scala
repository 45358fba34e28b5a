package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusFiltersSpec extends SparkSpec {

  test("repetitionSignals: fractions exact, repetitive doc filtered") {
    import spark.implicits._
    val docs = Seq(
      // 10 distinct tokens: top token 1/10, top bigram 1/9 — passes both
      // thresholds (note fraction filters inherently fail very short docs:
      // a 4-token doc already sits at 0.25 > 0.20)
      (1L, "the quick brown fox jumps over one lazy sleeping dog"),
      // "spam" owns 4/5 tokens and "spam spam" 3/4 bigrams -> filtered
      (2L, "spam spam spam spam eggs")
    ).toDF("doc_id", "text")
    val got = CorpusFilters.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0.1, 0.111111, true),
      (2L, 0.8, 0.75, false)))
  }

  test("repetitionSignals: single-token doc floors at one truncated bigram") {
    import spark.implicits._
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    val got = CorpusFilters.repetitionSignals(docs, "doc_id", "text")
      .select("top_token_frac", "top_bigram_frac")
      .as[(Double, Double)].head()
    assert(got == ((1.0, 1.0))) // degenerate doc: maximally repetitive
  }

  test("packSequences: budget boundaries respected per shard, deterministic") {
    import spark.implicits._
    // one shard so the packing order is fully observable
    val docs = Seq(
      (1L, "a b c"),   // 3 tokens, cum-before 0 -> pack 0
      (2L, "d e"),     // cum-before 3 -> pack 0
      (3L, "f g h i"), // cum-before 5 -> pack 1 (budget 5)
      (4L, "j")        // cum-before 9 -> pack 1
    ).toDF("doc_id", "text")
    val got = CorpusFilters.packSequences(docs, "doc_id", "text",
        tokenBudget = 5, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "pack_id", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 3L), (2L, 0L, 2L), (3L, 1L, 4L), (4L, 1L, 1L)))
  }

  test("packSequences: window is partitioned by shard (no global sort)") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (i.toLong, "tok " * 5)).toDF("doc_id", "text")
    val planned = CorpusFilters.packSequences(docs, "doc_id", "text", 512, 8)
    val exchanges = planned.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(exchanges.contains("hashpartitioning(shard"),
      s"window must shuffle on shard, got exchanges:\n$exchanges")
    assert(!exchanges.contains("SinglePartition"),
      s"no single-partition exchange allowed:\n$exchanges")
  }

  test("decontaminate: shared shingles counted over disjoint corpus/benchmark frames") {
    import spark.implicits._
    // doc 10 copies the benchmark sentence (all shingles hit); doc 11 shares
    // a 3-token run (one shingle); doc 12 is clean
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "zz alpha beta gamma yy"),
      (12L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val got = CorpusFilters.decontaminate(docs, bench, "doc_id", "text", shingleWidth = 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 2L), (11L, 1L)))
  }

  test("decontaminate: benchmark shingle set is broadcast (no corpus shuffle join)") {
    import spark.implicits._
    val bench = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val docs = Seq((2L, "a b c x")).toDF("doc_id", "text")
    val plan = CorpusFilters.decontaminate(docs, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join for the benchmark side, got:\n$plan")
  }

  test("lengthBuckets: smallest-cap assignment, over-cap docs clip to the max") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(3)("w").mkString(" ")),    // 3 toks  → cap 4
      (2L, Seq.fill(4)("w").mkString(" ")),    // 4 toks  → cap 4 (boundary)
      (3L, Seq.fill(5)("w").mkString(" ")),    // 5 toks  → cap 8
      (4L, Seq.fill(50)("w").mkString(" "))    // 50 toks → clips to 16
    ).toDF("doc_id", "text")
    val got = CorpusFilters.lengthBuckets(docs, "text", Seq(4L, 8L, 16L))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (4L, 2L, 7L, 1L, 0.125),      // docs 1+2: 3+4 kept, 8-7 padded
      (8L, 1L, 5L, 3L, 0.375),
      (16L, 1L, 16L, 0L, 0.0)))     // clipped doc: zero padding at the cap
  }

  test("lengthBuckets rejects non-ascending caps") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      CorpusFilters.lengthBuckets(docs, "text", Seq(8L, 4L))
    }
  }

  test("spanCorruption: sentinels, pass-through tail, overrun span kept") {
    import spark.implicits._
    // 12 tokens, every=7 phase=3 len=3: span 0 at 3..5, span at 10 would
    // need 10+3<=12 → false, so t10 t11 pass through untouched.
    val docs = Seq((1L, (0 to 11).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = CorpusFilters
      .spanCorruption(docs, "doc_id", "text", every = 7, phase = 3, spanLen = 3)
      .as[(Long, Long, String, String)].head()
    assert(r._2 == 1)
    assert(r._3 == "t0 t1 t2 <X0> t6 t7 t8 t9 t10 t11")
    assert(r._4 == "<X0> t3 t4 t5")
    // two spans: 17 tokens → starts at 3 and 10
    val docs2 = Seq((1L, (0 to 16).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r2 = CorpusFilters
      .spanCorruption(docs2, "doc_id", "text", 7, 3, 3)
      .as[(Long, Long, String, String)].head()
    assert(r2._2 == 2)
    assert(r2._3 == "t0 t1 t2 <X0> t6 t7 t8 t9 <X1> t13 t14 t15 t16")
    assert(r2._4 == "<X0> t3 t4 t5 <X1> t10 t11 t12")
    intercept[IllegalArgumentException] {
      CorpusFilters.spanCorruption(docs, "doc_id", "text", 3, 2, 3)
    }
  }

  test("blockwordGate: hit count, ratio, and the OR of both gate arms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "bad bad bad ok ok"),        // 3 hits, ratio 0.6 → both arms
      (2L, "bad ok ok ok ok ok ok ok ok ok"), // 1 hit, ratio 0.1 → ratio arm
      (3L, "ok ok ok ok ok ok ok ok ok ok"))  // clean
      .toDF("doc_id", "text")
    val r = CorpusFilters
      .blockwordGate(docs, "doc_id", "text", Seq("bad"),
        minHits = 3L, maxRatio = 0.05)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(r(0) == ((1L, 3L, 5L, 0.6, true)))
    assert(r(1) == ((2L, 1L, 10L, 0.1, true)))  // ratio arm alone fires
    assert(r(2) == ((3L, 0L, 10L, 0.0, false)))
  }
}
