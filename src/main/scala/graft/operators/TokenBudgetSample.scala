package graft.operators

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic data-mixture sampling to per-domain token budgets — the
  * construction step of an LLM training mix ("x billion tokens of English,
  * y of code, ..."): rank each domain's documents by a content hash (a
  * reproducible shuffle, no RNG), and keep documents while the domain's
  * running token total stays within its budget.
  *
  * Scale shape — the same two-pass histogram cut as [[ScalableNtile]], NOT
  * a per-domain global window (a cumulative sum over "all English docs
  * ordered by hash" serializes the dominant language through one task at
  * 100 TB):
  *
  *  1. docs bucket by the TOP BITS of their 56-bit rank hash (bucket order
  *     = hash order); per-(domain, bucket) token sums aggregate to the
  *     driver — bounded: domains × nBuckets rows;
  *  2. the driver walks each domain's buckets in order: buckets whose
  *     cumulative total fits the budget are kept WHOLE (a codegen'd filter,
  *     no window, no shuffle); buckets past the cut are dropped whole; the
  *     ONE straddling bucket per domain gets the remaining budget;
  *  3. only straddling-bucket rows (≤ 1/nBuckets of each domain) flow into
  *     the per-domain cumulative window.
  *
  * nBuckets scales the window input down (total/nBuckets rows per domain);
  * at 100 TB raise it so a bucket fits an executor — the driver histogram
  * stays tiny either way.
  *
  * Exactness contract: every document must contribute ≥ 1 token
  * (whitespace tokenization guarantees this — `size(split(...))` ≥ 1).
  * Zero-token docs after an exactly-exhausted budget would be kept by the
  * windowed definition but dropped by the whole-bucket cut.
  *
  * Returns `(doc_id, lang, n_tokens)` — the sampled corpus manifest.
  * Domains absent from `budgets` are dropped (budget 0).
  */
object TokenBudgetSample {

  /** Hash salt: keeps the mixture shuffle independent of other hash uses. */
  private val Salt = "mix|"

  /** Hard ceiling on driver-histogram cells (|budgets| × nBuckets). The
    * budgets map is driver-resident already, so this is a consistency
    * check, not a scan — the bound is CHECKED, never assumed (the
    * `BpeVocab.train` measured-size idiom). */
  val MaxDriverHistogramCells: Long = 1L << 24

  def apply(docs: DataFrame, idCol: String, langCol: String, tokenCol: Column,
            budgets: Map[String, Long], nBuckets: Int = 256): DataFrame = {
    require(nBuckets >= 1 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(budgets.size.toLong * nBuckets <= MaxDriverHistogramCells,
      s"${budgets.size} budget domains × $nBuckets buckets exceeds the " +
        s"driver histogram bound $MaxDriverHistogramCells — lower nBuckets")
    val bucketWidth = (1L << 56) / nBuckets
    val base = docs.select(
      col(idCol).as("doc_id"),
      col(langCol).as("lang"),
      tokenCol.cast("long").as("n_tokens"),
      Dedup.hexHash(col(idCol).cast("string"), Salt).as("rk"))
      // domains absent from `budgets` are dropped (budget 0) — filtering
      // them BEFORE the histogram is what makes the driver collect
      // CHECKED-bounded at |budgets| × nBuckets cells regardless of the
      // data's group cardinality (a caller histogramming on host with a
      // 10-domain budget must not collect 10M hosts × buckets)
      .filter(col("lang").isin(budgets.keys.toSeq.sorted: _*))
      .withColumn("__bucket", expr(s"rk div $bucketWidth"))

    // bounded driver histogram: |budgets| × nBuckets, checked above
    val hist = base.groupBy(col("lang"), col("__bucket"))
      .agg(sum(col("n_tokens")).as("toks"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    // per domain: (buckets kept whole: < fullCut) and the straddling bucket
    // with its already-consumed offset
    case class Cut(lang: String, fullCut: Long, straddle: Option[(Long, Long)],
                   budget: Long)
    val cuts = hist.keys.toSeq.sorted.flatMap { lang =>
      val budget = budgets.getOrElse(lang, 0L)
      val buckets = hist(lang).sortBy(_._2)
      var acc = 0L
      var fullCut = 0L
      var straddle = Option.empty[(Long, Long)]
      buckets.iterator.takeWhile(_ => straddle.isEmpty && acc < budget)
        .foreach { case (_, b, toks) =>
          if (acc + toks <= budget) { acc += toks; fullCut = b + 1 }
          else straddle = Some((b, acc))
        }
      if (budget == 0L) None else Some(Cut(lang, fullCut, straddle, budget))
    }

    def orOver(preds: Seq[Column]): Column =
      preds.reduceOption(_ || _).getOrElse(lit(false))

    val keepWhole = orOver(cuts.map(c =>
      col("lang") === c.lang && col("__bucket") < c.fullCut))
    val wholeRows = base.filter(keepWhole)
      .select(col("doc_id"), col("lang"), col("n_tokens"))

    val straddlers = cuts.filter(_.straddle.isDefined)
    if (straddlers.isEmpty) wholeRows
    else {
      val inStraddle = orOver(straddlers.map(c =>
        col("lang") === c.lang && col("__bucket") === c.straddle.get._1))
      // per-domain remaining budget after the whole buckets, as when-ladders
      // (≤ |domains| branches — driver-side constants, fully codegen'd)
      def ladder(f: Cut => Long): Column = straddlers.tail
        .foldLeft(when(col("lang") === straddlers.head.lang, f(straddlers.head))) {
          case (acc, c) => acc.when(col("lang") === c.lang, f(c))
        }
      // the window input is ONE bucket per domain — bounded by total/nBuckets
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("rk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val straddleRows = base.filter(inStraddle)
        .withColumn("__cum", ladder(_.straddle.get._2) + sum(col("n_tokens")).over(w))
        .filter(col("__cum") <= ladder(_.budget))
        .select(col("doc_id"), col("lang"), col("n_tokens"))
      wholeRows.unionByName(straddleRows)
    }
  }

  /** The windowed definition (executable spec + the oracle's shape): exact
    * per-domain cumulative order — correct, but serializes each domain
    * through one window task; use `apply` at scale. */
  def windowed(docs: DataFrame, idCol: String, langCol: String, tokenCol: Column,
               budgets: Map[String, Long]): DataFrame = {
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (l, b)) =>
        when(col("lang") === l, b).otherwise(acc)
      }
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(
      col(idCol).as("doc_id"),
      col(langCol).as("lang"),
      tokenCol.cast("long").as("n_tokens"),
      Dedup.hexHash(col(idCol).cast("string"), Salt).as("rk"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") <= budgetCol)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }
}
