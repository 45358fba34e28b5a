package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the corpus-statistics queries added in round 11:
  * Matryoshka truncation recall, distinct-n diversity, Zipf slope. */
class CorpusStatsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("e_matryoshka_recall: one row per prefix width, recall bounded") {
    val rows = SparkEntry.queries("e_matryoshka_recall")(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    val nQ = Tables.embeddings(spark, d)
      .filter(col("vec_id") % 50 === 0).count()
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 3 * nQ,
        s"n_hits ${r.getLong(1)} outside [0, ${3 * nQ}]")
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $rec")
    }
    // the full 64-dim list is its own ground truth, so SOME prefix must
    // recover at least one neighbor on this corpus
    assert(rows.map(_.getLong(1)).max > 0L, "every prefix recalled nothing")
  }

  test("e_distinct_n: per (source, n) ratios are consistent") {
    val rows = SparkEntry.queries("e_distinct_n")(spark, d).collect()
    assert(rows.nonEmpty)
    val nSources = Tables.documents(spark, d)
      .select(countDistinct(col("source"))).head().getLong(0)
    assert(rows.length == 3 * nSources,
      s"expected ${3 * nSources} rows, got ${rows.length}")
    rows.foreach { r =>
      val (grams, distinct) = (r.getLong(2), r.getLong(3))
      assert(distinct >= 1L && distinct <= grams,
        s"distinct $distinct outside [1, $grams]")
      val ratio = r.getDouble(4)
      assert(ratio > 0.0 && ratio <= 1.0, s"ratio out of range: $ratio")
    }
  }

  test("e_zipf_slope: single fitted row with a negative slope") {
    val rows = SparkEntry.queries("e_zipf_slope")(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) >= 2L, "need at least two points to fit")
    assert(r.getDouble(1) < 0.0,
      s"token frequencies must fall with rank (slope ${r.getDouble(1)})")
  }

  test("e_ql_dirichlet: bounded list, smoothing keeps scores finite and ordered") {
    val rows = SparkEntry.queries("e_ql_dirichlet")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(s => !s.isNaN && !s.isInfinite))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "list must be score-descending")
    // matched docs must outrank unmatched ones under the same smoothing
    val matched = rows.filter(_.getLong(1) > 0).map(_.getDouble(2))
    val unmatched = rows.filter(_.getLong(1) == 0).map(_.getDouble(2))
    if (matched.nonEmpty && unmatched.nonEmpty)
      assert(matched.min >= unmatched.max - 1e-9)
  }

  test("e_rank_corr: rho within [-1, 1] and consistent with its own sums") {
    val rows = SparkEntry.queries("e_rank_corr")(spark, d).collect()
    assert(rows.length == 1)
    val (n, d2, rho) = (rows.head.getLong(0), rows.head.getLong(1),
      rows.head.getDouble(2))
    assert(n >= 2)
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
    val expect = 1.0 - 6.0 * d2 / (n.toDouble * (n.toDouble * n - 1))
    assert(math.abs(rho - expect) < 1e-6)
  }

  test("e_concordance: every hit shows the phrase at its position") {
    val rows = SparkEntry.queries("e_concordance")(spark, d).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, d)
      .select(col("doc_id"), split(trim(col("text")), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      val (docId, pos) = (r.getLong(0), r.getLong(1).toInt)
      val toks = texts(docId)
      assert(toks.slice(pos, pos + 3).mkString(" ") == r.getString(3),
        s"phrase mismatch at doc $docId pos $pos")
      assert(toks.slice(math.max(pos - 3, 0), pos).mkString(" ") == r.getString(2),
        s"left context mismatch at doc $docId pos $pos")
      assert(toks.slice(pos + 3, pos + 6).mkString(" ") == r.getString(4),
        s"right context mismatch at doc $docId pos $pos")
    }
  }

  test("e_token_dispersion: VMR is non-negative and df-consistent") {
    val rows = SparkEntry.queries("e_token_dispersion")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nDocs = Tables.documents(spark, d).count()
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), "total_count must be >= df")
      assert(r.getLong(2) <= nDocs, "df cannot exceed corpus size")
      assert(r.getDouble(3) >= 0.0, s"VMR negative: ${r.getDouble(3)}")
    }
  }

  test("e_bottomk_sample: k smallest hashes per source, rank-ordered") {
    val rows = SparkEntry.queries("e_bottomk_sample")(spark, d).collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 5, s"source $src has ${rs.length} > k rows")
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(2)).toSeq ==
        sorted.map(_.getLong(2)).sortBy(identity).toSeq,
        s"hashes not ascending with rank for $src")
    }
    // stability: the sample is a pure function of doc_id hashes, so the
    // same query over the half-corpus keeps every surviving member that
    // still has a small-enough hash (consistent-sample property)
    val full = rows.map(r => (r.getString(0), r.getLong(1))).toSet
    val halfDocs = Tables.documents(spark, d).filter(col("doc_id") % 2 === 0)
    val halfRows = graft.operators.GroupedTopK.topKPerKey(
        halfDocs.select(col("source"), col("doc_id"),
          (-(graft.dedup.Dedup.hexHash(col("doc_id").cast("string"), "bk|")
            % (1L << 40))).as("neg_h")),
        "source", "neg_h", "doc_id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // any full-corpus sample member with an even doc_id must reappear in
    // the half-corpus sample (nothing new can displace it)
    full.filter(_._2 % 2 == 0).foreach { m =>
      assert(halfRows.contains(m), s"member $m lost on the sub-corpus")
    }
  }
}
