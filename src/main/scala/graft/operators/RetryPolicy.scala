package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Retry / notify classification and backoff math (P5, P6, W3, W4).
  *
  * Reference semantics:
  *   - HTTP status 429, 408, or any 5xx is retryable; everything else is a
  *     non-retryable "notify" failure (/root/reference/ActionFunctions/
  *     HttpPostAction.cs:67-83).
  *   - An error marker string starting with "retry=false" forces the notify
  *     path (ExecuteTriggerHelper.cs:123-126).
  *   - Orchestrated retry interval: linear `first + retryCount`, capped at
  *     `max` (RetryFunctions.cs:30-33).
  *   - Activity retry policy: geometric `firstSeconds * coef^n`, capped
  *     (RetryFunctions.cs:41-46 — 10 s * 1.125^n; NotifyFunctions.cs:23-26 —
  *     15 s * 1.1125^n cap 45 s).
  *
  * All of these are pure column expressions (whole-stage-codegen friendly;
  * no UDFs), usable in both batch classification queries and the driver-side
  * scheduler.
  */
object RetryPolicy {

  /** P5 — classify an int HTTP status column: retryable vs notify. */
  def classifyStatus(status: Column): Column =
    when(status.isin(429, 408) || status >= 500, "retry").otherwise("notify")

  /** P5 as a plain predicate (scala-side, for the sink/scheduler). */
  def isRetryableStatus(status: Int): Boolean =
    status == 429 || status == 408 || status >= 500

  /** P6 — the "retry=false..." marker string suppresses retry. */
  def allowsRetry(errorMarker: Column): Column =
    !errorMarker.startsWith("retry=false")

  def allowsRetry(errorMarker: String): Boolean =
    errorMarker == null || !errorMarker.startsWith("retry=false")

  /** W3 — capped linear backoff: min(first + n, max), unit-agnostic. */
  def linearBackoff(n: Column, first: Int, max: Int): Column =
    least(lit(first) + n, lit(max))

  def linearBackoff(n: Int, first: Int, max: Int): Int =
    math.min(first + n, max)

  /** W4 — capped geometric backoff: min(first * coef^n, max). */
  def geometricBackoff(n: Column, firstSeconds: Double, coef: Double, maxSeconds: Double): Column =
    least(lit(firstSeconds) * pow(lit(coef), n), lit(maxSeconds))

  def geometricBackoff(n: Int, firstSeconds: Double, coef: Double, maxSeconds: Double): Double =
    math.min(firstSeconds * math.pow(coef, n.toDouble), maxSeconds)
}
