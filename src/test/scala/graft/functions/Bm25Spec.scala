package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class Bm25Spec extends SparkSpec {

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "spark shuffles data fast"),          // 1× spark, dl 4
      (2L, "spark spark spark"),                  // 3× spark, dl 3
      (3L, "a plain row with no match here"),     // dl 7
      (4L, "query the query planner")             // 2× query, dl 4
    ).toDF("doc_id", "text")
  }

  // hand-computed reference (k1 = 1.2, b = 0.75): N = 4, avgdl = 4.5
  private def ref(tf: Double, df: Double, dl: Double): Double = {
    val n = 4.0; val avgdl = 4.5
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
  }

  test("scores match the Okapi formula; unmatched docs absent") {
    val out = Bm25.topDocs(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 4L), "doc 3 matches nothing")
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == ((1L, r6(ref(1, 2, 4)))))
    assert(out(2L) == ((1L, r6(ref(3, 2, 3)))))
    assert(out(4L) == ((1L, r6(ref(2, 1, 4)))))
    // saturation beats raw counts only sub-linearly: 3× spark in a SHORTER
    // doc must outrank 1× spark, and the rarer term (query, df 1) gets the
    // higher idf
    assert(out(2L)._2 > out(1L)._2)
  }

  test("n_terms counts distinct matched terms") {
    import spark.implicits._
    val two = Seq((7L, "spark query spark")).toDF("doc_id", "text")
    val out = Bm25.topDocs(two, "doc_id", "text", Seq("spark", "query"))
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
  }

  test("topK cuts after the (rounded score, doc_id) order") {
    val top2 = Bm25.topDocs(docs, "doc_id", "text", Seq("spark", "query"),
      topK = 2).collect().map(_.getLong(0)).toSeq
    val allRanked = Bm25.topDocs(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0))
    assert(top2 == allRanked.take(2).toSeq)
  }
}
