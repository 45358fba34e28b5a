package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global NTILE — exact SQL `ntile(n) OVER (ORDER BY keys)`
  * semantics without the single-partition global window that serializes the
  * whole table through one task (fatal at 100×).
  *
  * Two-pass histogram plan:
  *
  *  1. the caller supplies a deterministic BIN expression that is monotone
  *     non-decreasing in the sort order (e.g. `floor(price / step)` when
  *     sorting by price): every bin then owns a contiguous global-rank
  *     interval. The bin histogram is aggregated and collected — bounded
  *     (~value-range/step rows), the same driver-side role as
  *     RangePartitioner's sample but exact and deterministic (no seed);
  *  2. bins whose rank interval falls inside ONE tile are assigned
  *     driver-side and broadcast back — those rows never shuffle;
  *  3. only the ≤ n-1 bins straddling a tile cutoff are window-ranked
  *     (partitioned by bin — a few bins' worth of rows), with
  *     `bin_offset + row_number` the exact global rank, mapped through the
  *     SQL ntile formula (first N%n tiles take ⌈N/n⌉ rows, the rest ⌊N/n⌋).
  *
  * Net: narrow scan for ~all rows, one tiny shuffle for the cutoff bins —
  * no full-table exchange.
  *
  * Assignment form: there are at most `numTiles-1` straddling bins (each
  * interior tile cutoff lies in exactly one bin), and the uniform bin→tile
  * mapping is a monotone step function whose runs strictly increase in tile
  * — at most `numTiles` runs. Both lookups therefore compress to O(tiles)
  * `when`-ladders: the uniform branch is a pure codegen'd scan+project with
  * NO join, no broadcast, no exchange at all. Only above `maxLadderTiles`
  * (where a ladder would bloat codegen) does assignment fall back to a
  * broadcast-join of the bin table.
  *
  * Cost profile: 2 Spark jobs of FIXED overhead (histogram + result) versus
  * the naive plan's single job. At toy scale (≤1M rows) the naive
  * single-task window is still faster in wall-clock (one task sorting a
  * few MB is free); the crossover is where one task can no longer hold the
  * table — exactly the regime this engine targets. The constant overhead is
  * one extra job over the (cached) input for a plan whose window input
  * shrinks from N rows to a few bins' worth.
  *
  * Determinism: ties in `sortKeys` across a bin boundary would make ranks
  * ambiguous, so supply sort keys that are unique per row (standard practice
  * for reproducible window output anyway). Skew: a degenerate distribution
  * (most rows in one bin) needs a finer step or a composite bin key — the
  * same remedy as any skewed shuffle key.
  *
  * Bin contract: the bin expression must be NUMERIC (it is floored to a
  * long); a NULL bin — e.g. from a null sort column — maps to Long.MinValue,
  * i.e. nulls rank first, matching Spark's default ASC NULLS FIRST window
  * ordering. Input lifecycle: the operator scans `df` three times (histogram
  * + the two join branches); if `df` is an expensive derived plan rather
  * than a (cached) scan, persist it around the call — the operator does not
  * persist internally because a lazily-returned result gives it no correct
  * release point (the round-2 cache-leak lesson).
  */
object ScalableNtile {

  def apply(df: DataFrame, numTiles: Long, bin: Column,
            sortKeys: Seq[Column], out: String = "ntile",
            maxLadderTiles: Long = 128L): DataFrame = {
    require(numTiles >= 1, "numTiles must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val binDt = df.select(bin.as("__bin")).schema.head.dataType
    require(binDt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"bin expression must be numeric, got ${binDt.sql}")
    // floor to long + null→MinValue: every bin is a non-null long, so the
    // histogram read below cannot NPE and the bin lookups cannot drop rows
    val binned = df.withColumn("__bin",
      coalesce(bin.cast("long"), lit(Long.MinValue)))
    // bounded histogram, not table data; sorted driver-side — a distributed
    // orderBy before collect() would add a whole shuffle+sort stage just to
    // order a few hundred rows
    val hist = binned.groupBy(col("__bin")).agg(count(lit(1)).as("cnt"))
      .collect().sortBy(_.getLong(0))
    val total = hist.map(_.getLong(1)).sum
    val bigSize = total / numTiles + 1 // first (total % numTiles) tiles
    val smallSize = math.max(total / numTiles, 1L)
    val firstBlock = (total % numTiles) * bigSize
    def tileOfRank(rank: Long): Long =
      if (rank <= firstBlock) (rank - 1) / bigSize + 1
      else total % numTiles + (rank - 1 - firstBlock) / smallSize + 1
    var running = 0L
    val binInfo = hist.map { r =>
      val (b, cnt) = (r.getLong(0), r.getLong(1))
      val o = running; running += cnt
      (b, o, tileOfRank(o + 1) == tileOfRank(o + cnt))
    }
    val straddle = binInfo.collect { case (b, o, false) => (b, o) } // ≤ tiles-1
    val w = Window.partitionBy(col("__bin")).orderBy(sortKeys: _*)
    val tileExpr =
      when(col("__rank") <= firstBlock,
          expr(s"(`__rank` - 1) div $bigSize"))
        .otherwise(expr(s"${total % numTiles} + (`__rank` - 1 - $firstBlock) div $smallSize"))
        .cast("long") + 1L

    val useLadder = numTiles <= maxLadderTiles
    val straddleBins = straddle.map(_._1)
    def isStraddle: Column =
      if (straddleBins.isEmpty) lit(false)
      else col("__bin").isin(straddleBins: _*)

    // ladder form: ≤ numTiles-1 straddling bins and ≤ numTiles uniform runs
    // — both fit O(tiles) when-ladders, so NEITHER branch joins: the uniform
    // branch is a pure scan+project. Above maxLadderTiles (ladders would
    // bloat codegen) assignment falls back to a broadcast equi-join.
    def uniformRows: DataFrame =
      if (useLadder) {
        // runs of histogram-consecutive uniform bins sharing a tile; tiles
        // strictly increase across runs (every gap is a straddling bin
        // holding ≥1 cutoff), so an ascending `<= hi` ladder is exact
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        binInfo.foreach { case (b, o, unif) =>
          if (unif) {
            val t = tileOfRank(o + 1)
            if (runs.nonEmpty && runs.last._2 == t) runs(runs.size - 1) = (b, t)
            else runs += ((b, t))
          }
        }
        val ladder =
          if (runs.size == 1) lit(runs.head._2)
          else runs.init.tail
            .foldLeft(when(col("__bin") <= runs.head._1, runs.head._2)) {
              case (acc, (hi, t)) => acc.when(col("__bin") <= hi, t)
            }.otherwise(runs.last._2)
        binned.filter(!isStraddle)
          .select((cols.map(col) :+ ladder.cast("long").as(out)): _*)
      } else {
        val uniform = binInfo
          .collect { case (b, o, true) => (b, tileOfRank(o + 1)) }
          .toSeq.toDF("__bin", out)
        binned.join(broadcast(uniform), Seq("__bin"))
          .select((cols.map(col) :+ col(out)): _*)
      }

    def straddlingRows: DataFrame = {
      val withOffset =
        if (useLadder) {
          val offset = straddle.tail
            .foldLeft(when(col("__bin") === straddle.head._1, straddle.head._2)) {
              case (acc, (b, o)) => acc.when(col("__bin") === b, o)
            }
          binned.filter(isStraddle).withColumn("__bin_offset", offset)
        } else
          binned.join(broadcast(straddle.toSeq.toDF("__bin", "__bin_offset")),
            Seq("__bin")) // inner join = cutoff-bin filter
      withOffset
        .withColumn("__rank", col("__bin_offset") + row_number().over(w).cast("long"))
        .select((cols.map(col) :+ tileExpr.as(out)): _*)
    }
    // skip an empty branch entirely — a fine binning has no straddling bins
    // and a single-bin degenerate has no uniform ones; either way one fewer
    // union job of pure overhead
    if (binInfo.forall(_._3)) uniformRows
    else if (binInfo.forall(!_._3)) straddlingRows
    else uniformRows.unionByName(straddlingRows)
  }
}
