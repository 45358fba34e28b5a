package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Physical-plan contracts for the graded queries — the "would this survive
  * 100×" checks as automated assertions, not one-off explain reviews:
  * pruning reaches the scan, dims broadcast, top-k avoids full sorts. */
class PlanAssertionsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val d = "/root/testdata/sf0.001"

  private def executedPlan(name: String) = {
    val df = SparkEntry.queries(name)(spark, d)
    df.count() // finalize AQE
    df.queryExecution.executedPlan
  }

  test("p1 allowlist projection: column pruning reaches the parquet scan") {
    val scans = collectWithSubqueries(executedPlan("p1_allowlist_projection")) {
      case s: FileSourceScanExec => s
    }
    // Tables.read persists, so the scan may be an InMemoryTableScan instead;
    // assert on the analyzed output columns in that case.
    val out = SparkEntry.queries("p1_allowlist_projection")(spark, d)
    assert(out.columns.toSeq == Seq("c_custkey", "c_name", "c_acctbal"))
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet.subsetOf(
        Set("c_custkey", "c_name", "c_acctbal")),
        s"scan read ${s.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("jx_star_join: all three dimension tables broadcast") {
    val plan = executedPlan("jx_star_join")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size == 3, s"expected 3 broadcast joins, got ${bhj.size}")
    val bx = collectWithSubqueries(plan) { case b: BroadcastExchangeExec => b }
    assert(bx.nonEmpty)
  }

  test("lx_top_k plans TakeOrderedAndProject (no full global sort)") {
    val plan = executedPlan("lx_top_k")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"top-k should avoid a full sort:\n$plan")
  }

  test("j2 batched self-join broadcasts the id CTE") {
    val plan = executedPlan("j2_batched_selfjoin")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "CTE side must broadcast")
  }

  test("wx_ntile: no single-partition global window (scale-safe quartiles)") {
    val plan = executedPlan("wx_ntile")
    val globalWindows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"ntile must not serialize the table through one window task:\n$plan")
  }

  test("e_lm_tail_cut: decile cut uses the histogram two-pass, no global window") {
    val plan = executedPlan("e_lm_tail_cut")
    val globalWindows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"the tail cut must not serialize the corpus through one window task:\n$plan")
  }

  test("corpus shuffle + curriculum order: every window is partitioned (no global sort task)") {
    // both operators exist to order a 100 TB corpus WITHOUT a single-
    // partition window: shuffle partitions by shard, curriculum by the
    // composite histogram bin
    // e_shuffle_quality reads the order back under the same discipline:
    // its adjacency lag partitions by shard too
    Seq("e_corpus_shuffle", "e_curriculum_order", "e_shuffle_quality").foreach { q =>
      val plan = executedPlan(q)
      val globalWindows = collectWithSubqueries(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty,
        s"$q must not serialize the corpus through one window task:\n$plan")
    }
  }

  test("e_lm_prune: TakeOrdered report head; the corpus never shuffles into the loss join") {
    val plan = executedPlan("e_lm_prune")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"the report cut must be a bounded heap pass, not a full sort:\n$plan")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"loss join must stay equi/broadcast:\n$bad")
  }

  test("p1_dynamic_allowlist: narrow map_filter plan (no explode, no aggregate)") {
    val plan = executedPlan("p1_dynamic_allowlist")
    val generates = collectWithSubqueries(plan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(generates.isEmpty, s"allowlist filter must not explode the map:\n$plan")
    val aggs = collectWithSubqueries(plan) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    assert(aggs.isEmpty, s"allowlist filter must not re-group per event:\n$plan")
  }

  test("latest-per-key and throttle aggregate PARTIALLY before the shuffle") {
    // the max_by/min_by formulations exist precisely for map-side combine:
    // the shuffle must carry pre-aggregated rows, not the raw table
    assert(executedPlan("w1_latest_per_key").toString.contains("partial_max_by"),
      "w1 must partially aggregate map-side")
    assert(executedPlan("a4_dedup_latest").toString.contains("partial_max_by"),
      "a4 must partially aggregate map-side")
    assert(executedPlan("t7_throttle_window").toString.contains("partial_min_by"),
      "t7 must partially aggregate map-side")
  }

  test("passage dedup: survivor min aggregates PARTIALLY; equi-joins only") {
    // assert on the un-checkpointed plan (the graded query materializes its
    // result, which would scan the checkpoint and hide the shape)
    val docs = graft.Tables.documents(spark, d)
    val (result, inter) = graft.dedup.Dedup.passageDedupPlan(
      docs, "doc_id", "text", 10, 1L << 20, 16)
    result.count() // finalize AQE
    val plan = result.queryExecution.executedPlan
    // the survivor choice must be the associative min AGGREGATION (map-side
    // combined — skew-immune for any passage frequency), never a sorted
    // row_number window over the passage partition
    assert(plan.toString.contains("partial_min"),
      s"survivor min must combine map-side:\n$plan")
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"passage dedup must not window:\n$plan")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"passage join-back must stay equi, found: $bad")
    inter.foreach(_.unpersist(false))
  }

  test("boilerplate removal: distinct-doc count aggregates PARTIALLY; equi-joins only; no window") {
    val docs = graft.Tables.documents(spark, d)
    val (result, inter) = graft.dedup.Dedup.boilerplateRemovePlan(
      docs, "doc_id", "text", 10, 3, 1L << 20, 16)
    result.count() // finalize AQE
    val plan = result.queryExecution.executedPlan
    // count(distinct doc_id) must plan as the two-round partial aggregation
    // ((ph, doc_id) dedup then count, both map-side combined) — reducer
    // input bounded for ANY segment frequency
    assert(plan.toString.contains("partial_count"),
      s"document frequency must combine map-side:\n$plan")
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"boilerplate removal must not window:\n$plan")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"boilerplate join-back must stay equi, found: $bad")
    inter.foreach(_.unpersist(false))
  }

  test("decontamination: the benchmark shingle set joins BROADCAST") {
    // the corpus side must never shuffle for the contamination probe — the
    // tiny eval-set side broadcasts and the join is map-side
    val docs = graft.Tables.documents(spark, d)
    val hits = graft.functions.CorpusFilters.decontaminate(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0),
      "doc_id", "text")
    hits.count()
    val bhj = collectWithSubqueries(hits.queryExecution.executedPlan) {
      case j: BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, "benchmark shingles must broadcast:\n" +
      hits.queryExecution.executedPlan)
  }

  test("e_embed_outliers: the k-row cluster stats join BROADCAST") {
    // the assignment side (n rows) must never shuffle for the z-score —
    // stats are k rows and ride a broadcast
    val bhj = collectWithSubqueries(executedPlan("e_embed_outliers")) {
      case j: BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, "cluster stats must broadcast")
  }

  test("e_ngram_jaccard and e_simhash_multitable: no cartesian/nested-loop") {
    // e_phash_neardup rides the same multi-table Hamming banding — the
    // image near-dup must stay a (tbl, bucket) equi-join, never all-pairs;
    // e_containment_dup shares the jaccard path's df-capped shingle join
    // e_winnow_matches is the same relational shape over the winnowed
    // selection: df-capped hash equi-join, never all-pairs
    for (q <- Seq("e_ngram_jaccard", "e_simhash_multitable", "e_phash_neardup",
                  "e_containment_dup", "e_winnow_matches")) {
      val bad = collectWithSubqueries(executedPlan(q)) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(bad.isEmpty, s"$q must stay on equi-joins, found: $bad")
    }
  }

  test("LCP family: TakeOrdered final cut; no cartesian in the adjacency join") {
    for (q <- Seq("e_lcp_repeats", "e_exact_contamination")) {
      val plan = executedPlan(q)
      assert(plan.toString.contains("TakeOrderedAndProject"),
        s"$q top-k spans must not global-sort:\n$plan")
      val bad = collectWithSubqueries(plan) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(bad.isEmpty, s"$q rank adjacency must stay an equi-join, found: $bad")
    }
  }

  test("e_dsir_weights: the bucket model joins BROADCAST; corpus never shuffle-joins") {
    // the whole point of feature hashing is a model bounded at `buckets`
    // cells: scoring must be a broadcast join against the feature stream,
    // never a shuffle of the corpus onto the model's key. The graded
    // query memoizes (checkpoints) the scored table, which hides the
    // scoring subplan — assert on the direct dsirLogRatios plan (the
    // e_nb_classify pattern).
    val df = graft.functions.ImportanceWeights.dsirLogRatios(
      graft.Tables.documents(spark, d), "doc_id", "text",
      isTarget = org.apache.spark.sql.functions.col("lang") === "en",
      buckets = 64)
    df.count()
    val plan = df.queryExecution.executedPlan
    val shuffled = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffled.isEmpty, s"DSIR scoring must not shuffle-join:\n$plan")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"the log-ratio model must broadcast:\n$plan")
  }

  test("e_nb_classify: the log-likelihood grid joins BROADCAST; corpus never shuffle-joins") {
    // the point of feature hashing is a classes×buckets model: scoring
    // must broadcast the grid against the feature stream, never shuffle
    // the corpus onto the model's key (the e_dsir_weights contract).
    // The graded query memoizes (checkpoints) the scored table, which
    // hides the scoring subplan — assert on the direct classify plan.
    val df = graft.functions.NaiveBayes.classify(
      graft.Tables.documents(spark, d), "doc_id", "text", "lang",
      isEval = org.apache.spark.sql.functions.col("doc_id") % 3 === 0,
      buckets = 64)
    df.count()
    val plan = df.queryExecution.executedPlan
    val shuffled = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffled.isEmpty, s"NB scoring must not shuffle-join:\n$plan")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"the log-likelihood grid must broadcast:\n$plan")
  }

  test("e_cdc_chunks: segmentation is one narrow scan — no join, no aggregation exchange") {
    // CDC boundaries and chunk assembly are in-row; the only plan nodes
    // allowed beyond the scan are projections, the generator, and the
    // output ordering
    val plan = executedPlan("e_cdc_chunks")
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"segmentation must not join:\n$plan")
    val aggs = collectWithSubqueries(plan) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.isEmpty, s"segmentation must not aggregate:\n$plan")
  }

  test("e_semantic_dedup and e_curation_funnel: no cartesian/nested-loop anywhere") {
    for (q <- Seq("e_semantic_dedup", "e_curation_funnel")) {
      val bad = collectWithSubqueries(executedPlan(q)) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(bad.isEmpty, s"$q must stay on equi-joins, found: $bad")
    }
  }

  test("e_pq_adc_topk: LUT joins broadcast; no cartesian; vectors never shuffle") {
    val plan = executedPlan("e_pq_adc_topk")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"ADC must stay on the (m, code) equi-join, found: $bad")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"the partial-distance LUT must broadcast:\n$plan")
    // the only shuffle may carry (query, neighbor, partial) aggregation rows
    // — never an embedding array
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.dataType.isInstanceOf[
          org.apache.spark.sql.types.ArrayType]),
        s"raw vectors must not shuffle at ADC query time:\n$plan")
    }
  }

  test("e_ivfpq_topk: candidate scan is the broadcast (cell, code) equi-join") {
    val plan = executedPlan("e_ivfpq_topk")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      // the old crossJoin(centroids) cell scoring planned as a
      // broadcast-nested-loop over n×K rows; in-row CellAssignment
      // removed it — keep it out
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"IVF-PQ must never plan a cartesian/nested-loop, found: $bad")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty,
      s"the probe×LUT table must broadcast against the inverted file:\n$plan")
  }

  test("e_ivf_topk: in-row cell assignment — no nested-loop centroid scoring") {
    val plan = executedPlan("e_ivf_topk")
    val bad = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty,
      s"cell assignment must be the in-row argmax, not an n×K product:\n$plan")
  }

  test("e_ivfpq_residual: narrow corpus encode — no cartesian, LUT broadcasts, vectors never shuffle") {
    val plan = executedPlan("e_ivfpq_residual")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"residual IVFADC must never plan a cartesian, found: $bad")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty,
      s"the probe×LUT table must broadcast against the inverted file:\n$plan")
    // the in-row assignment + residual encode means NO exchange anywhere
    // carries an embedding/residual array — the corpus is read once,
    // narrowly; only (query, neighbor, partial) scalar rows shuffle
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.dataType.isInstanceOf[
          org.apache.spark.sql.types.ArrayType]),
        s"raw vectors/residuals must not shuffle:\n$plan")
    }
  }

  test("e_kmeans_silhouette: one narrow scan — no join, arrays never shuffle") {
    val plan = executedPlan("e_kmeans_silhouette")
    val joins = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      s"silhouette must be in-row against the collected means, found:\n$joins")
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.dataType.isInstanceOf[
          org.apache.spark.sql.types.ArrayType]),
        s"embedding arrays must not shuffle in the silhouette scan:\n$plan")
    }
  }

  test("e_dup_triangles, e_dup_kcore, e_dedup_best: equi-joins only") {
    for (q <- Seq("e_dup_triangles", "e_dup_kcore", "e_dedup_best")) {
      val bad = collectWithSubqueries(executedPlan(q)) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(bad.isEmpty, s"$q must stay on equi-joins, found: $bad")
    }
  }

  test("e_lm_kneser_ney: model joins hash; only the one-row stats frame crosses") {
    val plan = executedPlan("e_lm_kneser_ney")
    val cart = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cart.isEmpty, s"no shuffle cartesian allowed: $cart")
    // the only nested-loop permitted is the broadcast of the (b_types,
    // v_types) scalar frame — a one-row cross, the engine's stats
    // convention (same shape as the interpolated scorer)
    val bnlj = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    // the stats frame itself is assembled from two single-row aggregates,
    // so both its internal cross and the final attach may appear
    bnlj.foreach { j =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
      }
      val buildCols = build.output.map(_.name).toSet
      assert(buildCols.nonEmpty &&
          buildCols.subsetOf(Set("b_types", "v_types")),
        s"only the scalar stats frame may cross-join, built: $buildCols")
    }
  }

  test("e_ivfpq_rerank: shortlist broadcasts; corpus embeddings never shuffle") {
    val plan = executedPlan("e_ivfpq_rerank")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"re-rank must stay on equi-joins, found: $bad")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty,
      s"the ADC shortlist (and query vectors) must broadcast:\n$plan")
    // the exact re-score fetches candidate embeddings via the broadcast
    // join — no shuffle may carry an embedding array
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.dataType.isInstanceOf[
          org.apache.spark.sql.types.ArrayType]),
        s"corpus embedding arrays must not shuffle in the refine stage:\n$plan")
    }
  }

  test("e_bm25: term df broadcasts; top-k is TakeOrderedAndProject") {
    val plan = executedPlan("e_bm25")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"the per-term df table must broadcast:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"the top-k cut must avoid a global sort:\n$plan")
  }

  test("e_interval_join: grid equi-join, never a nested-loop range join") {
    val plan = executedPlan("e_interval_join")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty,
      s"interval overlap must bin to an equi-join, found: $bad")
  }

  test("e_weighted_sample: ONE TakeOrderedAndProject cut serves sample and τ") {
    val plan = executedPlan("e_weighted_sample")
    val cuts = collectWithSubqueries(plan) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(cuts.size == 1,
      s"the priority cut must be a single bounded per-partition heap pass " +
        s"(found ${cuts.size}):\n$plan")
    // the τ/rank windows are allowed ONLY above the bounded cut (≤ n+1
    // rows); a global window whose subtree has no TakeOrdered limit would
    // be serializing the corpus through one task
    val globalWindows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    globalWindows.foreach { w =>
      val bounded = w.collectFirst {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
        case g: org.apache.spark.sql.execution.GlobalLimitExec => g
      }
      assert(bounded.isDefined,
        s"global window must read the bounded top-(n+1) cut, not the corpus:\n$plan")
    }
  }

  test("e_cluster_sample: per-cluster cut is the bounded aggregator — no Window anywhere") {
    val plan = executedPlan("e_cluster_sample")
    val windows = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"the diversity cut must not sort whole clusters through k window tasks:\n$plan")
    assert(plan.toString.toLowerCase.contains("partial"),
      s"map-side partial top-k aggregation missing:\n$plan")
  }

  test("e_audio_neardup + e_video_neardup: segment banding is an equi-join — no cartesian/nested-loop") {
    for (q <- Seq("e_audio_neardup", "e_video_neardup")) {
      val plan = executedPlan(q)
      val bad = collectWithSubqueries(plan) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(bad.isEmpty,
        s"$q: segment pairs must route through the rotated-prefix equi-join, found:\n$bad")
    }
  }

  test("e_cosine_neardup: LSH-bucketed, no cartesian product in the plan") {
    val plan = executedPlan("e_cosine_neardup")
    val bad = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty,
      s"near-dup pairs must route through the band equi-join, found:\n$bad")
  }

  test("e_ql_dirichlet: corpus token arrays never shuffle; scalars broadcast") {
    val plan = executedPlan("e_ql_dirichlet")
    // the factored form's corpus-wide work is the narrow (doc_id, dl)
    // scan — an array column in any exchange means the explode leaked
    // past the posting filter
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      assert(!e.child.output.exists(_.dataType.isInstanceOf[
          org.apache.spark.sql.types.ArrayType]),
        s"token arrays must not reach an exchange in the QL plan:\n$plan")
    }
    val bx = collectWithSubqueries(plan) { case b: BroadcastExchangeExec => b }
    assert(bx.nonEmpty, s"the query scalars/cf frames must broadcast:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"the top-k cut must be a bounded heap pass:\n$plan")
  }

  test("e_phrase_search: the top-phrase postings read is a broadcast join") {
    val plan = executedPlan("e_phrase_search")
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty,
      s"the one-row top-phrase frame must broadcast into the postings:\n$plan")
  }

  test("e_bottomk_resemblance: every window is pair-partitioned (sketch-sized)") {
    val plan = executedPlan("e_bottomk_resemblance")
    val unpartitioned = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"union-sketch ranking must partition by the source pair:\n$plan")
  }
}
