package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
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
  * re-opens it. State is one long per key. No GroupStateTimeout: a
  * processing-time timeout makes the engine spin empty micro-batches just to
  * fire expirations, and event-time expiry would demand a watermark column —
  * for bounded key domains (tables being monitored) the long-per-key state
  * is already O(live keys); wire `EventTimeTimeout` + `withWatermark` if the
  * key domain is unbounded.
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
}
