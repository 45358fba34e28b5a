package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming next-event transition pairs — the incremental form of the
  * batch Markov transition matrix (`SeqQueries.eEventTransitions`): as
  * events arrive, emit one (prev_type, next_type) pair per consecutive
  * per-user event, carrying each user's LAST event in keyed state so
  * pairs that straddle a micro-batch boundary are emitted exactly once.
  * Downstream, a plain streaming aggregation (or foreachBatch fold) keeps
  * the running matrix; this operator owns only the pairing, which is the
  * part that needs state.
  *
  * Ordered-arrival contract (same as the change-feed delivery order every
  * incremental operator here assumes): per user, batches arrive in event
  * order; WITHIN a batch arrival order is repaired by an (event_time,
  * event_id) sort. Under that contract the emitted pair multiset equals
  * the batch lag-pair computation over the union at every fold point
  * (spec-proven). State is ONE carried event per live user — O(users),
  * independent of stream length. */
object StreamingTransitions {

  case class Ev(user: Long, et: Long, eventId: Long, eventType: String)
  case class Pair(user: Long, prevType: String, nextType: String)
  case class Carry(et: Long, eventId: Long, eventType: String)

  private val pairingFunc: (Long, Iterator[Ev], GroupState[Carry]) => Iterator[Pair] =
    (user: Long, rows: Iterator[Ev], state: GroupState[Carry]) => {
      // repair within-batch arrival order; across batches the carried
      // state is the contract's responsibility
      val sorted = rows.toSeq.sortBy(e => (e.et, e.eventId))
      var prev = state.getOption
      val out = Seq.newBuilder[Pair]
      sorted.foreach { e =>
        prev.foreach(p => out += Pair(user, p.eventType, e.eventType))
        prev = Some(Carry(e.et, e.eventId, e.eventType))
      }
      prev.foreach(state.update)
      out.result().iterator
    }

  /** Emit per-user consecutive-event transition pairs, carrying the last
    * event per user across batches. `initial` seeds the per-user carry
    * state (the restart path: derive each user's last event from the
    * already-processed prefix and resume — the same seeded-restart
    * contract the other incremental operators prove). */
  def transitions(ds: Dataset[Ev],
                  initial: Option[Dataset[(Long, Carry)]] = None): Dataset[Pair] = {
    implicit val pairEnc = Encoders.product[Pair]
    implicit val carryEnc = Encoders.product[Carry]
    val grouped = ds.groupByKey(_.user)(Encoders.scalaLong)
    initial match {
      case Some(init) =>
        val initState = init.groupByKey(_._1)(Encoders.scalaLong)
          .mapValues(_._2)(carryEnc)
        grouped.flatMapGroupsWithState[Carry, Pair](
          OutputMode.Update(), GroupStateTimeout.NoTimeout(), initState)(
          pairingFunc)(carryEnc, pairEnc)
      case None =>
        grouped.flatMapGroupsWithState[Carry, Pair](
          OutputMode.Update(), GroupStateTimeout.NoTimeout())(
          pairingFunc)(carryEnc, pairEnc)
    }
  }
}
