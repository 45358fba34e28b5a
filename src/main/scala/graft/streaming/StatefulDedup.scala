package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch latest-state dedup (T3's stateful form): within one delivery
  * the batch dedup in ChangeFeed suffices, but redeliveries and out-of-order
  * batches can resurface older versions of a key across micro-batches.
  * `flatMapGroupsWithState` keeps the highest version seen per key and emits
  * a record only when its version advances — the streaming engine's keyed
  * state store holds exactly one long per key, so state is O(live keys)
  * regardless of stream length.
  */
object StatefulDedup {

  case class Keyed[K, V](key: K, version: Long, value: V)

  /** Emit only version-advancing records per key. Works on any
    * KeyValueGroupedDataset-compatible stream or batch Dataset. */
  def latestOnly[K, V](ds: Dataset[Keyed[K, V]])(
      implicit ek: Encoder[K], ekv: Encoder[Keyed[K, V]]): Dataset[Keyed[K, V]] = {
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, Keyed[K, V]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[Keyed[K, V]], state: GroupState[Long]) =>
          val seen = state.getOption.getOrElse(Long.MinValue)
          // within the batch, keep only the max-version record, then compare
          // against the cross-batch high-water mark. Version ties break on
          // the VALUE (not arrival order, which differs across checkpoint
          // replays) so the emitted record is a pure function of the data
          val best = rows.maxByOption(r => (r.version, String.valueOf(r.value)))
          best match {
            case Some(b) if b.version > seen =>
              state.update(b.version)
              Iterator.single(b)
            case _ => Iterator.empty
          }
      }(Encoders.scalaLong, ekv)
  }
}
