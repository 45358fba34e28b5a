package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the versioning primitive an incremental
  * pipeline runs between two corpus releases: which documents were
  * added, removed, or content-modified. The relational sibling is the
  * CDC change feed (reference: SQL change-tracking polls,
  * /root/reference/SqlTriggerApp/SqlTriggerFunctions.cs:31-56); this
  * form needs no upstream change log — it derives the delta from the
  * two snapshots themselves, the common case for file-dropped corpora.
  *
  * Scale shape: both sides project to (id, md5) BEFORE the join — the
  * shuffle carries two narrow hash columns, never document bodies — and
  * the full-outer join shuffles on the id key once. At 100 TB both
  * snapshots would be bucketed by id (storage/Bucketing), making the
  * join exchange-free; the operator is unchanged.
  */
object CorpusDiff {

  /** Per-document diff status between snapshots `v1` → `v2`:
    * (doc_id, status ∈ added | removed | modified | unchanged). */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // Presence rides explicit flags, NOT hash nullability: md5(null
    // text) is null, and a null-hash presence proxy would report a doc
    // with null text in BOTH snapshots as "added" forever. The content
    // compare is null-SAFE (<=>) so null→null is unchanged and
    // null↔non-null is modified.
    val a = v1.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__h1"),
      lit(1).as("__p1"))
    val b = v2.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__h2"),
      lit(1).as("__p2"))
    a.join(b, Seq("doc_id"), "full")
      .select(col("doc_id"),
        when(col("__p1").isNull, lit("added"))
          .when(col("__p2").isNull, lit("removed"))
          .when(col("__h1") <=> col("__h2"), lit("unchanged"))
          .otherwise(lit("modified")).as("status"))
  }

  /** The delta alone (unchanged rows dropped) — what an incremental
    * downstream (re-embed, re-index, re-dedup) actually consumes. */
  def delta(v1: DataFrame, v2: DataFrame, idCol: String,
            textCol: String): DataFrame =
    snapshotDiff(v1, v2, idCol, textCol)
      .filter(col("status") =!= "unchanged")
}
