package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** The unpartitioned-window BUDGET: a global (empty-partition) Window is
  * the classic scale-killer — every row shuffles into ONE task — so the
  * engine fences the few deliberately-bounded exceptions by NAME and
  * fails this spec if any other query grows one. This pins the bench
  * tail's `WindowExec: No Partition Defined` warning count to the
  * documented sites, so new global windows can never hide in the noise.
  *
  * Budgeted (name → window count; each window reads a provably bounded
  * frame, never the corpus — the bound is documented at each definition;
  * Spark 4.1's EliminateWindowPartitions folds constant `lit(0)` keys
  * away, so sites written with a constant partition key surface here as
  * empty-spec windows too):
  *  - e_zipf_slope: rank over the ≤ ZipfTopN post-limit head.
  *  - e_rank_corr: 2 rank windows over ≤ Bm25TopK post-limit cuts.
  *    (e_rank_overlap had the same 2 windows planned TWICE until round
  *    13; its by-depth table is now checkpointed once, so the bounded
  *    subplan no longer appears in the visible plan at all.)
  *  - e_hybrid_rrf: lexical rank over the ≤ RrfDepth post-topK cut.
  *  - e_vocabulary / e_vocabulary_unicode / e_vocab_coverage: rank over
  *    the ≤ 50 / max(k) post-limit head.
  *  - e_vocab_growth: cumulative sum over ≤ VocabGrowthBuckets rows.
  *  - e_heavy_hitters: rank over the ≤ CmsTopK sketch head.
  *  - e_weighted_sample: 2 windows over the ≤ n-bounded priority sample.
  *  - e_ivf_balance: share-of-total over ≤ IvfCells rows.
  *  - e_bootstrap_ci: rank over the ≤ BootReplicas replica means.
  *  - e_ks_drift: cumulative CDF over the value DOMAIN's distinct
  *    values (value-count histogram grain, corpus-independent).
  */
class WindowBudgetSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private val budget = Map(
    "e_zipf_slope" -> 1, "e_rank_corr" -> 2,
    "e_hybrid_rrf" -> 1,
    "e_vocabulary" -> 1, "e_vocabulary_unicode" -> 1,
    "e_vocab_coverage" -> 1, "e_vocab_growth" -> 1,
    "e_heavy_hitters" -> 1, "e_weighted_sample" -> 2,
    "e_ivf_balance" -> 1, "e_bootstrap_ci" -> 1, "e_ks_drift" -> 1)

  private def globalWindows(p: LogicalPlan): Int =
    p.collect { case w: Window if w.partitionSpec.isEmpty => w }.size

  test("only the documented bounded-frame queries plan a global window") {
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = globalWindows(fn(spark, d).queryExecution.optimizedPlan)
        if (n > 0) offenders(name) = n
      } catch {
        case e: Throwable => failures += s"$name: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, s"queries failed to plan: $failures")
    assert(offenders.toMap == budget,
      s"global-window budget violated — offenders ${offenders.toSeq.sorted} " +
        s"vs budget ${budget.toSeq.sorted}; a NEW entry here means a " +
        "corpus-wide single-task window slipped into a query (fix it or, if " +
        "the frame is provably bounded, document the bound at the definition " +
        "and extend the budget)")
  }
}
