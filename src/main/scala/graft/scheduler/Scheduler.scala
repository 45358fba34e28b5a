package graft.scheduler

import graft.operators.{Purge, RetryPolicy}
import graft.state.{KVStore, LeaseStore}
import org.apache.spark.sql.DataFrame
import java.sql.Timestamp
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap

/** Driver-side orchestration — deliberately OUTSIDE the query engine
  * (SURVEY.md §4.3): retry loops, notification throttling, singleton
  * scheduling, and scheduled cleanup are plain Scala over the state stores,
  * mirroring the reference's Durable Functions orchestrations
  * (/root/reference/RetryFunctions/RetryFunctions.cs,
  * NotifyFunctions/NotifyFunctions.cs, CleanupFunction/CleanupFunction.cs).
  * Only the data path distributes across executors.
  */
object Scheduler {

  /** Injectable time so orchestration logic unit-tests with virtual time
    * (no Thread.sleep in tests — SURVEY.md §5 risk table). */
  trait Clock {
    def now(): Instant
    def sleep(millis: Long): Unit
  }

  object SystemClock extends Clock {
    override def now(): Instant = Instant.now()
    override def sleep(millis: Long): Unit = Thread.sleep(millis)
  }

  /** Virtual clock: sleep() advances instantly; records total slept. */
  final class VirtualClock(start: Instant = Instant.EPOCH) extends Clock {
    private var t = start
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    override def now(): Instant = t
    override def sleep(millis: Long): Unit = { sleeps += millis; t = t.plusMillis(millis) }
    def advance(millis: Long): Unit = t = t.plusMillis(millis)
  }

  /** Retry orchestration config (local.settings.json:12-18 defaults). */
  case class RetryConfig(
      firstIntervalMinutes: Int = 6,
      maxIntervalMinutes: Int = 12,
      totalTimeoutHours: Int = 168,
      notifyOnRetryCount: Int = 10,
      intervalUnitMillis: Long = 60000L) // minutes; tests use 1ms "minutes"

  sealed trait RetryResult
  case object Recovered extends RetryResult // attempts cleared (< 1)
  case object TimedOut extends RetryResult  // total retry timeout hit

  /** The eternal retry orchestrator (RetryFunctions.cs:19-68 + activity
    * :112-176): wait a capped-linear interval, inspect the lease, nudge the
    * exhausted attempt count 5→4 to re-arm redelivery, fire the notification
    * ONCE when the retry count reaches the configured threshold and KEEP
    * retrying (RetryFunctions.cs:169-173 falls through to `ContinueAsNew` at
    * :50,56-63 — delivery is only abandoned on recovery or total timeout).
    * Synchronous driver loop — each `ContinueAsNew` generation is one
    * iteration (the loop carries retryCount exactly as the orchestration
    * input does). Terminates: Recovered when the lease clears, TimedOut
    * after `totalTimeoutHours`. */
  def runRetryLoop(table: String, lease: LeaseStore, cfg: RetryConfig,
                   clock: Clock, onNotify: String => Unit): RetryResult = {
    val start = clock.now()
    var retryCount = 0
    var notified = false
    while (true) {
      val intervalUnits = RetryPolicy.linearBackoff(retryCount,
        cfg.firstIntervalMinutes, cfg.maxIntervalMinutes)
      clock.sleep(intervalUnits * cfg.intervalUnitMillis)
      // CheckSqlStatus activity (RetryFunctions.cs:112-176)
      val timedOut = start.plusMillis(cfg.totalTimeoutHours * 3600L * 1000L)
        .isBefore(clock.now())
      if (timedOut) return TimedOut
      lease.attemptCount(table) match {
        case None => return Recovered
        case Some(n) if n < 1 => return Recovered
        case Some(5) =>
          lease.nudgeIfExhausted(table,
            Timestamp.from(clock.now())) // re-arm redelivery (:159-167)
        case _ => ()
      }
      retryCount += 1
      // threshold <= 0 disables notification entirely (>= alone would fire
      // on the first retry for a 0 threshold — the opposite of "never")
      if (!notified && cfg.notifyOnRetryCount > 0 &&
          retryCount >= cfg.notifyOnRetryCount) { // :169-173
        onNotify(table)
        notified = true // notify once, then continue retrying (:50)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Notification throttle (T7 — NotifyFunctions.cs:29-34): a notification
    * for a key is suppressed while a previous one is inside the `windowMin`
    * window. State lives in a KVStore so throttling survives restarts. */
  final class NotifyThrottler(state: KVStore, windowMinutes: Int, clock: Clock) {
    /** Returns true when the notification fired; false when throttled. */
    def notify(key: String, send: String => Unit): Boolean = {
      val now = clock.now()
      val throttled = state.get(key).exists { lastMillis =>
        now.toEpochMilli - lastMillis.toLong < windowMinutes * 60000L
      }
      if (throttled) false
      else {
        send(key)
        state.save(key, now.toEpochMilli.toString, Timestamp.from(now))
        true
      }
    }
  }

  /** Singleton-by-id start (T8 — RetryFunctions.cs:75-108): at most one
    * running orchestration per instance id; a second start is a no-op while
    * the first runs. */
  final class SingletonRegistry {
    private val running = ConcurrentHashMap.newKeySet[String]()
    /** Runs `body` unless `id` is already running. Returns true if started. */
    def runSingleton(id: String)(body: => Unit): Boolean = {
      if (!running.add(id)) false
      else
        try { body; true }
        finally { running.remove(id) }
    }

    /** Start with retry (RetryFunctions.cs:75-108, NotifyFunctions.cs:61-98):
      * an id that is ALREADY RUNNING is a successful NO-OP — the reference
      * checks `GetInstanceAsync(...).IsRunning` and returns immediately
      * without scheduling (RetryFunctions.cs:79-87). The 5×2s retry applies
      * only to FAILED schedule attempts (`ScheduleNewOrchestrationInstance`
      * throwing, RetryFunctions.cs:95-105); the last failure is rethrown.
      *
      * In this synchronous in-process model the schedule step and the run
      * are one call, so a `body` that throws is treated as a failed START
      * attempt and retried — callers whose body does real work before its
      * first failure point should keep that prefix idempotent. Returns true
      * whether `body` ran here or the id was already running (both are
      * successful starts in the reference's contract). */
    def runSingletonWithRetry(id: String, clock: Clock, attempts: Int = 5,
                              delayMillis: Long = 2000L)(body: => Unit): Boolean = {
      var attempt = 1
      while (true) {
        if (isRunning(id)) return true // already running: no-op success
        try {
          runSingleton(id)(body)
          // started and ran, or lost the acquire race to a concurrent
          // starter (= already running) — success either way
          return true
        } catch {
          case e: Throwable =>
            if (attempt >= attempts) throw e
            clock.sleep(delayMillis)
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }

    def isRunning(id: String): Boolean = running.contains(id)
  }

  /** Scheduled history cleanup (T10 — CleanupFunction.cs:9-41), with the
    * intended per-family retention (the reference reuses the completed-days
    * cutoff for the failed family by mistake; see Purge). */
  def cleanup(history: DataFrame, clock: Clock,
              keepCompletedDays: Int = 7, keepFailedDays: Int = 30): DataFrame = {
    val now = clock.now()
    Purge.purge(history, "created", "status",
      completedCutoff = Timestamp.from(now.minusSeconds(keepCompletedDays * 86400L)),
      failedCutoff = Timestamp.from(now.minusSeconds(keepFailedDays * 86400L)))
  }
}
