package graft.functions

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test assignment for a training corpus.
  *
  * Splitting by a hash of the DOCUMENT id leaks data: near-duplicate
  * documents land in different splits, so the eval set contains
  * paraphrases of training documents. Splitting by the near-dup CLUSTER id
  * (from [[graft.dedup.Dedup.labelPropagationClusters]]) puts every member
  * of a duplicate cluster in the same split — the standard leakage-safe
  * construction.
  *
  * Deterministic: the split is a pure function of the cluster id (salted
  * 56-bit hash mod 100 against percentage cutoffs), so re-runs, backfills,
  * and incremental additions to an existing cluster all agree. Pure column
  * expression over the cluster table — no shuffle beyond what produced the
  * clusters.
  */
object DatasetSplit {

  /** Hash salt: keeps split assignment independent of other hash uses. */
  private val Salt = "split|"

  /** `(… , split)` over a `(doc_id, cluster_id, …)` frame;
    * `trainPct + valPct <= 100`, the remainder is "test". */
  def leakageSafeSplit(clusters: DataFrame, clusterCol: String,
                       trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = Dedup.hexHash(col(clusterCol).cast("string"), Salt) % 100
    clusters.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
