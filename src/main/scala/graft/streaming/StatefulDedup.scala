package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch latest-state dedup (T3's stateful form): within one delivery
  * the batch dedup in ChangeFeed suffices, but redeliveries and out-of-order
  * batches can resurface older versions of a key across micro-batches.
  * `flatMapGroupsWithState` keeps the highest version seen per key and emits
  * a record only when its version advances — the streaming engine's keyed
  * state store holds exactly one long per key, so state is O(live keys)
  * regardless of stream length. That is the right bound for CDC, whose key
  * domain is the base table's PK set; for an UNBOUNDED key domain, apply
  * the watermark-eviction pattern of `StreamingThrottle.throttleExpiring`
  * (safe only if redeliveries are bounded by the watermark lateness, since
  * evicting a key forgets its high-water mark).
  */
object StatefulDedup {

  case class Keyed[K, V](key: K, version: Long, value: V)

  /** Emit only version-advancing records per key. Works on any
    * KeyValueGroupedDataset-compatible stream or batch Dataset.
    *
    * `tieBreak` orders equal-version records within a batch so the winner is
    * a pure function of the DATA, not of arrival order (which differs across
    * checkpoint replays). The default stringifies the value — value-based
    * for primitives, strings, and case classes; for types whose toString is
    * identity-based (e.g. `Array[Byte]`) supply a value-based projection
    * (`_.value.toSeq.toString`, a hash, ...) or replay determinism is lost. */
  def latestOnly[K, V](ds: Dataset[Keyed[K, V]],
                       tieBreak: Keyed[K, V] => String = (s: Keyed[K, V]) => String.valueOf(s.value))(
      implicit ek: Encoder[K], ekv: Encoder[Keyed[K, V]]): Dataset[Keyed[K, V]] = {
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, Keyed[K, V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[Keyed[K, V]], state: GroupState[Long]) =>
          val seen = state.getOption.getOrElse(Long.MinValue)
          // within the batch, keep only the max-version record, then compare
          // against the cross-batch high-water mark
          val best = rows.maxByOption(r => (r.version, tieBreak(r)))
          best match {
            case Some(b) if b.version > seen =>
              state.update(b.version)
              Iterator.single(b)
            case _ => Iterator.empty
          }
      }(Encoders.scalaLong, ekv)
  }
}
