package graft.functions

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("PMI matches the hand formula; collocated pair outranks chance pair") {
    import spark.implicits._
    // "x y" always collocates; "a b" co-occurs once among many a/b uses
    val docs = Seq(
      (1L, "x y a"), (2L, "x y b"), (3L, "a b a"), (4L, "b a b"))
      .toDF("doc_id", "text")
    val out = Collocations.topPmiBigrams(docs, "text", minCount = 2L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // unigrams: x=2 y=2 a=4 b=4, Nu=12; bigrams per doc: 2 each, Nb=8
    // counts ≥ 2: (x,y)=2, (a,b)=2 ("a b a" + "b a b"), (b,a)=2 (same)
    val nu = 12.0; val nb = 8.0
    def pmi(c12: Long, c1: Long, c2: Long) =
      r6(math.log((c12 / nb) / ((c1 / nu) * (c2 / nu))))
    assert(out.keySet == Set(("x", "y"), ("a", "b"), ("b", "a")),
      s"only pairs with count >= 2 survive, got ${out.keySet}")
    assert(out(("x", "y")) == ((2L, pmi(2, 2, 2))))
    assert(out(("a", "b")) == ((2L, pmi(2, 4, 4))))
    assert(out(("b", "a")) == ((2L, pmi(2, 4, 4))))
    // the dedicated collocation must outscore the frequent-word pair
    assert(out(("x", "y"))._2 > out(("a", "b"))._2)
  }

  test("minCount filters hapax pairs; topK caps the list") {
    import spark.implicits._
    val docs = Seq((1L, "p q r s t u")).toDF("doc_id", "text")
    val all = Collocations.topPmiBigrams(docs, "text", minCount = 1L, topK = 3)
      .collect()
    assert(all.length == 3, "topK must cap")
    val none = Collocations.topPmiBigrams(docs, "text", minCount = 2L, topK = 3)
      .collect()
    assert(none.isEmpty, "all pairs are hapax at minCount=2")
  }
}
