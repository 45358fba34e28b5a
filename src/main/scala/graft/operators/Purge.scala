package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** History purge (S10 / P9) — the reference's scheduled cleanup deletes
  * orchestration instances `created <= cutoff AND status IN (...)`
  * (/root/reference/CleanupFunction/CleanupFunction.cs:18-34): one pass for
  * Completed older than `keepCompletedDays`, one for
  * Terminated/Suspended/Failed older than `keepFailedDays`.
  *
  * Note (SURVEY.md §3.4): the reference computes the failed-history cutoff
  * from the *completed* retention by mistake (CleanupFunction.cs:26); we
  * implement the intended semantics — each status family uses its own
  * retention — and keep the quirk documented here.
  *
  * Spark-first: a delete is an anti-filter + overwrite. The predicate is a
  * plain column expression so it pushes down to the scan; at 100 TB the purge
  * only rewrites partitions containing matching rows (partition the state
  * table by date for that).
  */
object Purge {

  val CompletedStatuses: Seq[String] = Seq("Completed")
  val FailedStatuses: Seq[String]    = Seq("Terminated", "Suspended", "Failed")

  /** P9 — rows TO BE purged. */
  def purgePredicate(created: Column, status: Column,
                     cutoff: Timestamp, statuses: Seq[String]): Column =
    created <= lit(cutoff) && status.isin(statuses: _*)

  /** S10 — the surviving rows after both purge families. */
  def purge(history: DataFrame, createdCol: String, statusCol: String,
            completedCutoff: Timestamp, failedCutoff: Timestamp): DataFrame = {
    val c = col(createdCol); val s = col(statusCol)
    history.filter(
      !purgePredicate(c, s, completedCutoff, CompletedStatuses) &&
      !purgePredicate(c, s, failedCutoff, FailedStatuses))
  }
}
