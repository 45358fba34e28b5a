package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi-Sunter record-linkage weights — the probabilistic foundation
  * of entity resolution (Fellegi & Sunter, JASA 1969): for each compared
  * field, estimate `m = P(agree | match)` and `u = P(agree | non-match)`
  * from a labeled pair sample, and emit the log-likelihood-ratio weights
  * (`ln(m/u)` on agreement, `ln((1−m)/(1−u))` on disagreement) that a
  * linkage scorer sums per candidate pair.
  *
  * Blocking-first discipline: the input is a CANDIDATE pair table (LSH
  * bands, sorted neighborhood, any generator in [[Dedup]]) — never all
  * pairs — so the whole computation is pair-density-bounded. The
  * estimation itself is ONE unpivot (an in-row array explode, ×|fields|)
  * plus a fields-bounded aggregation with map-side combine; probabilities
  * are add-one smoothed so a field that never disagrees still yields
  * finite weights.
  */
object RecordLinkage {

  /** Per-field m/u probabilities and agreement/disagreement weights from
    * a labeled comparison table (`isMatchCol` boolean + one boolean
    * column per field). Output: (field, n_match, n_unmatch, m_prob,
    * u_prob, w_agree, w_disagree), 6-dp rounded, one row per field. */
  def fsWeights(comparisons: DataFrame, isMatchCol: String,
                fieldCols: Seq[String]): DataFrame = {
    require(fieldCols.nonEmpty, "need at least one comparison field")
    val unpivot = comparisons.select(col(isMatchCol).cast("boolean").as("mt"),
        explode(array(fieldCols.map(fc =>
          struct(lit(fc).as("field"), col(fc).cast("boolean").as("agree"))
        ): _*)).as("x"))
      .select(col("mt"), col("x.field").as("field"), col("x.agree").as("agree"))
    // A NULL comparison (missing field on either side) is NO EVIDENCE:
    // it joins neither the agreement numerators nor the denominators —
    // counting it as disagreement would skew m/u toward 0 for exactly
    // the fields with the most missing data.
    val g = unpivot.groupBy(col("field")).agg(
      sum(when(col("mt") && col("agree"), 1L).otherwise(0L)).as("am"),
      sum(when(col("mt") && col("agree").isNotNull, 1L).otherwise(0L))
        .as("nm"),
      sum(when(!col("mt") && col("agree"), 1L).otherwise(0L)).as("au"),
      sum(when(!col("mt") && col("agree").isNotNull, 1L).otherwise(0L))
        .as("nu"))
    val m = (col("am") + 1).cast("double") / (col("nm") + 2)
    val u = (col("au") + 1).cast("double") / (col("nu") + 2)
    g.select(col("field"), col("nm").as("n_match"), col("nu").as("n_unmatch"),
      round(m, 6).as("m_prob"), round(u, 6).as("u_prob"),
      round(log(m / u), 6).as("w_agree"),
      round(log((lit(1.0) - m) / (lit(1.0) - u)), 6).as("w_disagree"))
  }

  /** Score candidate pairs under fitted weights: per pair the summed
    * log-likelihood ratio (agreeing fields contribute `w_agree`,
    * disagreeing ones `w_disagree`). `weights` is fields-bounded and
    * broadcasts; the sum is one (pair × fields) unpivot + a pair-grain
    * aggregation. */
  def scorePairs(comparisons: DataFrame, idCols: Seq[String],
                 fieldCols: Seq[String], weights: DataFrame): DataFrame = {
    val unpivot = comparisons.select(idCols.map(col) :+
        explode(array(fieldCols.map(fc =>
          struct(lit(fc).as("field"), col(fc).cast("boolean").as("agree"))
        ): _*)).as("x"): _*)
      .select(idCols.map(col) :+ col("x.field").as("field") :+
        col("x.agree").as("agree"): _*)
    unpivot
      .join(broadcast(weights.select(col("field"), col("w_agree"),
        col("w_disagree"))), Seq("field"))
      .groupBy(idCols.map(col): _*)
      // NULL comparison contributes zero evidence, mirroring fsWeights
      .agg(round(sum(when(col("agree").isNull, lit(0.0))
        .when(col("agree"), col("w_agree"))
        .otherwise(col("w_disagree"))), 6).as("link_score"))
  }
}
