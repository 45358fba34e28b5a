package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkSpec {

  private def keys(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"content number $i")).toDF("id", "text")
  }

  test("no false negatives: every inserted key probes true") {
    val corpus = keys(1 to 2000)
    val bloom = BloomDedup.buildBloom(corpus, col("text"), 1 << 15, 7)
    val misses = corpus
      .filter(!BloomDedup.mightContain(bloom, 1 << 15, 7)(col("text")))
      .count()
    assert(misses == 0L, "a Bloom filter must never reject an inserted key")
  }

  test("false-positive rate sane for the sized filter") {
    val corpus = keys(1 to 2000)
    val bloom = BloomDedup.buildBloom(corpus, col("text"), 1 << 15, 7)
    // 2000 keys in 32768 bits ≈ 0.49% theoretical FP at k=7
    val disjoint = keys(100001 to 102000)
    val fp = disjoint
      .filter(BloomDedup.mightContain(bloom, 1 << 15, 7)(col("text")))
      .count()
    assert(fp < 100, s"FP rate out of band: $fp/2000")
  }

  test("freshDocs equals the plain anti-join") {
    import spark.implicits._
    // overlap: new batch shares half its contents with the corpus
    val corpus = (1 to 500).map(i => (i.toLong, s"doc ${i % 300}")).toDF("id", "text")
    val fresh = (1 to 200).map(i => (1000L + i, s"doc ${i + 200}")).toDF("id", "text")
    val got = BloomDedup.freshDocs(fresh, corpus, col("text"))
      .select("id").as[Long].collect().toSet
    val want = fresh.join(corpus.select(col("text")).distinct(), Seq("text"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(got == want)
    assert(want.nonEmpty && want.size < 200, "test data must exercise both paths")
  }

  test("empty corpus: everything is fresh, zero-filter probes all-false") {
    import spark.implicits._
    val corpus = keys(1 to 10).filter(lit(false))
    val fresh = keys(1 to 25)
    val got = BloomDedup.freshDocs(fresh, corpus, col("text")).count()
    assert(got == 25L)
  }

  test("e_bloom_dedup matches its oracle SQL (Spark SQL as stand-in engine)") {
    val d = "/root/testdata/sf0.001"
    graft.Tables.documents(spark, d).createOrReplaceTempView("documents")
    val got = graft.queries.ExtQueries.eBloomDedup(spark, d).collect().toSeq
    val want = spark.sql(graft.queries.ExtQueries.oracle("e_bloom_dedup")).collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("native probe: non-bigint hash inputs raise at analysis, not garbage") {
    import spark.implicits._
    val df = Seq(("a", "b")).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.plans.BloomExpression.bloomMightContain(
        col("x"), col("y"), new Array[Long](16), 1024, 7)).head()
    }
  }

  test("native probe: interpreted eval agrees with codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val corpus = keys(1 to 300)
    val bloom = BloomDedup.buildBloom(corpus, col("text"), 1 << 14, 7)
    // evaluate the two base hashes through the engine, then probe both
    // interpreted (Literal children + eval) and codegen (DataFrame filter)
    val (inKey, outKey) = (lit("content number 7"), lit("no such content"))
    for ((keyCol, want) <- Seq(inKey -> true, outKey -> false)) {
      val (g1c, g2c) = BloomDedup.hashPair(keyCol)
      val row = corpus.limit(1).select(g1c.as("g1"), g2c.as("g2")).head()
      val interpreted = graft.plans.BloomMightContain(
        Literal(row.getLong(0)), Literal(row.getLong(1)), bloom, 1 << 14, 7)
        .eval(null)
      val viaCodegen = corpus.limit(1)
        .select(BloomDedup.mightContain(bloom, 1 << 14, 7)(keyCol).as("hit"))
        .head().getBoolean(0)
      assert(interpreted == viaCodegen,
        s"interpreted/codegen disagree for want=$want")
      // out-of-corpus key could in principle be a false positive, but the
      // in-corpus key MUST probe true on both paths
      if (want) assert(viaCodegen)
    }
  }

  test("broadcast probe path (numBits > literal ceiling) equals the anti-join") {
    import spark.implicits._
    val corpus = (1 to 500).map(i => (i.toLong, s"doc ${i % 300}")).toDF("id", "text")
    val fresh = (1 to 200).map(i => (1000L + i, s"doc ${i + 200}")).toDF("id", "text")
    // 2^27 + 2^20 bits forces the Broadcast[Array[Long]] expression route
    val bigBits = (1 << 27) + (1 << 20)
    assert(bigBits > BloomDedup.LiteralBitCeiling)
    val got = BloomDedup.freshDocs(fresh, corpus, col("text"), numBits = bigBits)
      .select("id").as[Long].collect().toSet
    val want = fresh.join(corpus.select(col("text")).distinct(), Seq("text"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("broadcast probe: no false negatives, codegen and interpreted agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val numBits = (1 << 27) + 64
    val corpus = keys(1 to 500)
    val bloom = BloomDedup.buildBloom(corpus, col("text"), numBits, 7)
    val bc = spark.sparkContext.broadcast(bloom)
    val misses = corpus.filter(!{
      val (g1, g2) = BloomDedup.hashPair(col("text"))
      graft.plans.BloomExpression.bloomMightContainBroadcast(g1, g2, bc, numBits, 7)
    }).count()
    assert(misses == 0L, "broadcast probe must never reject an inserted key")
    val (g1c, g2c) = BloomDedup.hashPair(lit("content number 42"))
    val row = corpus.limit(1).select(g1c.as("g1"), g2c.as("g2")).head()
    val interpreted = graft.plans.BloomMightContainBroadcast(
      Literal(row.getLong(0)), Literal(row.getLong(1)), bc, numBits, 7).eval(null)
    assert(interpreted == true, "interpreted broadcast probe must hit")
  }

  test("sizeBits extends past the literal ceiling instead of silently capping") {
    // ~3*10^7 keys want 2^28+ bits; pre-round-5 this capped at 2^27 and the
    // FP rate quietly degraded — now it sizes on and routes via broadcast
    assert(BloomDedup.sizeBits(30L * 1000 * 1000) > BloomDedup.LiteralBitCeiling)
    assert(BloomDedup.sizeBits(30L * 1000 * 1000) <= BloomDedup.MaxAutoBits)
    assert(BloomDedup.sizeBits(100L) == 1 << 16, "floor unchanged")
  }

  test("only the might-contain branch joins") {
    val corpus = keys(1 to 100)
    val fresh = keys(50 to 150)
    val plan = BloomDedup.freshDocs(fresh, corpus, col("text"))
      .queryExecution.optimizedPlan.toString
    val joins = plan.linesIterator.count(_.contains("Join "))
    assert(joins == 1, s"definitely-fresh rows must not pay a join:\n$plan")
  }
}
