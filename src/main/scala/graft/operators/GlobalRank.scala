package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global `ORDER BY` positions without a single-partition window —
  * the histogram two-pass of [[ScalableNtile]] / [[CorpusShuffle]]
  * factored into a reusable primitive (the third consumer,
  * [[SuffixArray]], ranks per doubling round and made the copy-paste
  * untenable).
  *
  * Caller contract: `bin` must be MONOTONE in the requested sort order
  * (a ≤ b under `order` ⇒ bin(a) ≤ bin(b)) and every tie group under
  * `order` must land in ONE bin — then each bin owns a contiguous
  * interval of global positions. One bounded (bin, count) histogram
  * collects driver-side into per-bin offsets (the exact, seedless
  * analogue of a RangePartitioner sample); rows then learn
  * `offset + row_number` under a window PARTITIONED BY bin, so
  * parallelism = populated bins and no task ever sees more than its
  * bin's rows. The caller picks the binning density to match its data
  * (a rank-valued key scales to a fixed bin count; a string key bins by
  * codepoint prefix — UTF-8 byte order equals codepoint order, so the
  * prefix is monotone under Spark's binary string comparison).
  */
object GlobalRank {

  /** Bin for a dense positive sort key in [1, n]: scales to
    * [0, subBins) — monotone, tie-safe (equal keys share a bin),
    * driver histogram ≤ subBins rows. */
  def scaledBin(key: Column, n: Long, subBins: Int): Column = {
    require(subBins >= 1, "subBins must be >= 1")
    ((key.cast("long") - 1L) * subBins.toLong) / lit(math.max(n, 1L))
  }

  /** Bin for a string sort key: the first two codepoints packed into a
    * long. Monotone under binary string order; the histogram is bounded
    * by the distinct 2-char prefixes actually present. */
  def prefixBin(key: Column): Column =
    ascii(substring(key, 1, 1)).cast("long") * 0x110001L +
      when(length(key) >= 2,
        ascii(substring(key, 2, 1)).cast("long") + 1L).otherwise(0L)

  /** Adds `__rn` — the exact 1-based global `row_number()` under
    * `ORDER BY order ++ tieBreak` — and (when `emitRank`) `__grank` —
    * `rank()` semantics on `order` alone (every tie group shares its
    * minimum row number). `emitRank = false` skips the second in-bin sort
    * for callers that only need the row number ([[CorpusShuffle]]).
    * `maxBins` guards the driver histogram against a caller whose bin
    * expression is not actually bounded.
    *
    * Deliberately NOT used by [[ScalableNtile]]/[[GroupQuantileCut]]:
    * those need only a bounded set of CUT POINTS, so whole non-straddling
    * bins take a codegen filter with no window at all — a strictly
    * cheaper shape than per-row ranking. This primitive is for callers
    * that need the rank of EVERY row. */
  def withRank(df: DataFrame, bin: Column, order: Seq[Column],
               tieBreak: Seq[Column], maxBins: Long = 1L << 22,
               emitRank: Boolean = true): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    import spark.implicits._
    val binned = df.withColumn("__bin", bin.cast("long"))
    // the guard LIMIT sits under the collect: a caller whose bin
    // expression is effectively the row key fails the require with
    // maxBins+1 rows on the driver, instead of OOMing inside a full
    // collect before the check could run
    val lim = math.toIntExact(math.min(maxBins + 1, Int.MaxValue.toLong))
    val hist = binned.groupBy(col("__bin")).agg(count(lit(1)).as("cnt"))
      .limit(lim).as[(Long, Long)].collect().sortBy(_._1)
    require(hist.length <= maxBins,
      s"bin expression produced more than $maxBins bins — " +
        "not bounded enough for a driver histogram")
    var acc = 0L
    val offsets = hist.map { case (b, c) => val out = (b, acc); acc += c; out }
      .toSeq
    val offsetTable = broadcast(offsets.toDF("__bin", "__off"))
    val wRow = Window.partitionBy(col("__bin"))
      .orderBy((order ++ tieBreak): _*)
    // ties never straddle bins (caller contract), so global rank() = bin
    // offset + bin-local rank() — same partition key as the row-number
    // window, so both ride ONE exchange (two sorts, zero extra shuffles)
    val wTie = Window.partitionBy(col("__bin")).orderBy(order: _*)
    val withRn = binned.join(offsetTable, Seq("__bin"))
      .withColumn("__rn",
        (col("__off") + row_number().over(wRow)).cast("long"))
    val ranked =
      if (emitRank) withRn.withColumn("__grank",
        (col("__off") + rank().over(wTie)).cast("long"))
      else withRn
    ranked.drop("__bin", "__off")
  }
}
