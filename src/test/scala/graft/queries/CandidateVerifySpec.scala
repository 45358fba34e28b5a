package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Invariants for the candidate-verification / blocking / IR queries added
  * in round 11: LSH→edit-distance verify, sorted-neighborhood blocking,
  * positional phrase search, and source-level shingle Jaccard. Thresholds
  * mirror ExtQueries' documented constants. */
class CandidateVerifySpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val d = "/root/testdata/sf0.001"

  test("e_edit_verify: canonical pairs, bounded sims, verdict matches threshold") {
    val rows = SparkEntry.queries("e_edit_verify")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, s"pair not canonical: $a,$b")
      val sim = r.getDouble(4)
      assert(sim >= 0.0 && sim <= 1.0, s"edit_sim out of range: $sim")
      val verified = r.getBoolean(5)
      // rounded sim is within 5e-7 of the unrounded verdict input
      if (sim >= 0.8 + 1e-6) assert(verified, s"sim $sim must verify")
      if (sim <= 0.8 - 1e-6) assert(!verified, s"sim $sim must not verify")
    }
    // the planted near-dups at sf0.001 produce at least one verified pair
    assert(rows.exists(_.getBoolean(5)), "no verified duplicate found")
    assert(rows.exists(r => !r.getBoolean(5)),
      "every candidate verified — threshold not discriminating")
  }

  test("e_jaro_verify: same pair set as the edit pass, verdicts at the JW floor") {
    val jaro = SparkEntry.queries("e_jaro_verify")(spark, d).collect()
    val edit = SparkEntry.queries("e_edit_verify")(spark, d).collect()
    assert(jaro.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      edit.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "both verify stages must read the SAME candidate pair table")
    jaro.foreach { r =>
      val sim = r.getDouble(3)
      assert(sim >= 0.0 && sim <= 1.0)
      if (sim >= 0.95 + 1e-6) assert(r.getBoolean(4))
      if (sim <= 0.95 - 1e-6) assert(!r.getBoolean(4))
    }
    assert(jaro.exists(_.getBoolean(4)) && jaro.exists(r => !r.getBoolean(4)),
      "JW floor must discriminate on this corpus")
  }

  test("e_dup_explain: diff widths reconstruct the prefix lengths") {
    val rows = SparkEntry.queries("e_dup_explain")(spark, d).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, d)
      .select(col("doc_id"), substring(trim(col("text")), 1, 160).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (a, b) = (texts(r.getLong(0)), texts(r.getLong(1)))
      val (p, sfx) = (r.getLong(3), r.getLong(4))
      val (midA, midB) = (r.getLong(5), r.getLong(6))
      assert(p + sfx + midA == a.length, "side A must decompose exactly")
      assert(p + sfx + midB == b.length, "side B must decompose exactly")
      assert(a.take(p.toInt) == b.take(p.toInt), "prefix must match")
      assert(a.takeRight(sfx.toInt) == b.takeRight(sfx.toInt),
        "suffix must match")
      assert(midA >= 0 && midB >= 0)
      if (r.getBoolean(2)) {
        // a verified near-dup differs in a bounded middle
        assert(midA <= a.length && midB <= b.length)
      }
    }
    assert(rows.exists(_.getBoolean(2)), "no verified pair explained")
  }

  test("e_idf_cosine: canonical pairs, cosine in (0, 1], floor respected") {
    val rows = SparkEntry.queries("e_idf_cosine")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonical")
      val c = r.getDouble(2)
      assert(c >= 0.3 - 1e-6 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
    }
  }

  test("e_sorted_neighborhood: pairs share a block and respect the distance cap") {
    val out = SparkEntry.queries("e_sorted_neighborhood")(spark, d)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val blocks = Tables.documents(spark, d)
      .select(col("doc_id"), substring(trim(col("text")), 1, 8).as("blk"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, s"pair not canonical: $a,$b")
      assert(blocks(a) == r.getString(2) && blocks(b) == r.getString(2),
        s"pair ($a,$b) does not share block ${r.getString(2)}")
      assert(r.getLong(3) <= 40L, s"edit_dist ${r.getLong(3)} above cap")
    }
  }

  test("e_sorted_neighborhood: the per-block window is partitioned (scale fence)") {
    val df = SparkEntry.queries("e_sorted_neighborhood")(spark, d)
    df.count()
    val unpartitioned = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      "sorted-neighborhood must never plan an unpartitioned global window")
  }

  test("e_phrase_search: postings sum to the phrase's corpus frequency") {
    val rows = SparkEntry.queries("e_phrase_search")(spark, d).collect()
    assert(rows.nonEmpty)
    val phrase = rows.head.getString(0)
    assert(phrase.split(" ").length == 3, s"phrase '$phrase' is not a trigram")
    val nTotal = rows.head.getLong(1)
    assert(rows.forall(_.getString(0) == phrase))
    assert(rows.forall(_.getLong(1) == nTotal))
    assert(rows.map(_.getLong(3)).sum == nTotal,
      "per-doc hits must sum to the corpus total")
    assert(rows.forall(_.getLong(4) >= 0L), "first_pos must be non-negative")
  }

  test("e_bottomk_resemblance: every pair certified, estimate tracks exact") {
    val rows = SparkEntry.queries("e_bottomk_resemblance")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonical")
      val (est, exact) = (r.getDouble(2), r.getDouble(3))
      assert(est >= 0.0 && est <= 1.0, s"estimate out of range: $est")
      assert(r.getBoolean(4),
        s"pair (${r.getString(0)}, ${r.getString(1)}) outside the 3/sqrt(k) " +
          s"bound: est $est vs exact $exact")
    }
  }

  test("e_source_jaccard: canonical source pairs with valid Jaccard") {
    val rows = SparkEntry.queries("e_source_jaccard")(spark, d).collect()
    assert(rows.nonEmpty)
    val nSources = Tables.documents(spark, d)
      .select(countDistinct(col("source"))).head().getLong(0)
    assert(rows.length <= nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonical")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
      assert(r.getLong(2) >= 1L, "intersection must be positive for kept pairs")
    }
  }
}
