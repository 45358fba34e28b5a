package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native notification throttle — T7's canonical Structured
  * Streaming form (SURVEY.md §2.9): the reference suppresses duplicate
  * notifications for a key while a 360-minute singleton timer runs
  * (NotifyFunctions.cs:29-34). `Scheduler.NotifyThrottler` is the driver-side
  * equivalent over a KVStore; this operator is the distributed one — keyed
  * state in the streaming state store, so throttling scales with live keys
  * across every executor and survives restarts via the checkpoint.
  *
  * Semantics per key: the first event passes and opens a window of
  * `windowMillis` (event-time stamps compared against the stored deadline —
  * deterministic and replay-safe, unlike wall-clock); events inside the
  * window are dropped; the first event at/after the deadline passes and
  * re-opens it. State is one long per key.
  *
  * Two variants, split on the key domain:
  *
  *  - `throttle` — NO GroupStateTimeout: a processing-time timeout makes the
  *    engine spin empty micro-batches just to fire expirations. For bounded
  *    key domains (tables being monitored) long-per-key state is O(live
  *    keys) and never needs eviction;
  *  - `throttleExpiring` — `EventTimeTimeout` + watermark: a key's state is
  *    EVICTED once the watermark passes its window deadline (re-opening is
  *    then exactly the no-state first-event path, so semantics are
  *    unchanged). This is the unbounded-key-domain form: state holds only
  *    keys with a still-open window, not every key ever seen — at 100 TB of
  *    events the difference between a bounded state store and one that
  *    grows with stream history.
  */
object StreamingThrottle {

  case class Stamped[K, V](key: K, eventMillis: Long, value: V)

  /** Pass the first event per key per window; drop the rest.
    *
    * `tieBreak` orders equal-timestamp events so the throttle decision is a
    * pure function of the DATA, not of arrival order (which differs across
    * checkpoint replays). The default stringifies the value — value-based
    * for primitives, strings, and case classes; for identity-toString types
    * (e.g. `Array[Byte]`) supply a value-based projection. */
  def throttle[K, V](ds: Dataset[Stamped[K, V]], windowMillis: Long,
                     tieBreak: Stamped[K, V] => String = (s: Stamped[K, V]) => String.valueOf(s.value))(
      implicit ek: Encoder[K], esv: Encoder[Stamped[K, V]]): Dataset[Stamped[K, V]] = {
    require(windowMillis > 0, s"windowMillis must be positive, got $windowMillis")
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, Stamped[K, V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[Stamped[K, V]], state: GroupState[Long]) =>
          // events may arrive unordered within a batch: process in event
          // order so the throttle decision is deterministic
          var deadline = state.getOption.getOrElse(Long.MinValue)
          val passed = rows.toSeq.sortBy(s => (s.eventMillis, tieBreak(s)))
            .filter { s =>
              val open = s.eventMillis >= deadline
              if (open) deadline = s.eventMillis + windowMillis
              open
            }
          if (passed.nonEmpty) state.update(deadline)
          passed.iterator
      }(Encoders.scalaLong, esv)
  }

  /** `throttle` with state eviction for UNBOUNDED key domains: the input is
    * watermarked on event time (`delayThreshold` = the allowed lateness, in
    * Spark duration syntax e.g. "10 minutes"), and each key's state expires
    * once the watermark passes its window deadline. Late events inside the
    * lateness bound still throttle correctly; an expired key's next event is
    * a first event (passes, re-opens) — identical to the un-evicted
    * semantics, because expiry only ever removes CLOSED windows.
    *
    * Caveat inherent to watermarking: events LATER than `delayThreshold`
    * behind the watermark are dropped by the engine before this operator
    * sees them (including at stream start, where the initial watermark is
    * epoch 0 — events at or before it are "late"). The plain `throttle`
    * processes arbitrarily late events; this variant trades that for
    * bounded state. */
  def throttleExpiring[K, V](ds: Dataset[Stamped[K, V]], windowMillis: Long,
                             delayThreshold: String,
                             tieBreak: Stamped[K, V] => String = (s: Stamped[K, V]) => String.valueOf(s.value))(
      implicit ek: Encoder[K], esv: Encoder[Stamped[K, V]]): Dataset[Stamped[K, V]] = {
    // windowMillis = 0 would set a timeout timestamp equal to the current
    // watermark, which Spark rejects at runtime (and a zero window throttles
    // nothing anyway)
    require(windowMillis > 0, s"windowMillis must be positive, got $windowMillis")
    ds.withColumn("__ts", expr("timestamp_millis(eventMillis)"))
      .withWatermark("__ts", delayThreshold)
      .as[Stamped[K, V]](esv)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, Stamped[K, V]](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (_: K, rows: Iterator[Stamped[K, V]], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed the deadline: the window is closed, no event
            // inside it can still arrive — dropping state changes nothing
            state.remove()
            Iterator.empty
          } else {
            var deadline = state.getOption.getOrElse(Long.MinValue)
            val passed = rows.toSeq.sortBy(s => (s.eventMillis, tieBreak(s)))
              .filter { s =>
                val open = s.eventMillis >= deadline
                if (open) deadline = s.eventMillis + windowMillis
                open
              }
            if (passed.nonEmpty) {
              state.update(deadline)
              state.setTimeoutTimestamp(deadline) // evict at window close
            }
            passed.iterator
          }
      }(Encoders.scalaLong, esv)
  }
}
