package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch last-touch attribution
  * (`q_x_attribution`): per-user state is ONE (ts, id) pair — the
  * latest touch event seen — and every conversion emits immediately
  * with its attributed touch and lag. O(users) state; conversions
  * never wait for a window to close.
  *
  * Exactness contract (same as [[FunnelStream]]): equal to the batch
  * as-of attribution when arrival is in STRICT event-time order across
  * micro-batches; equal-time ties are handled exactly only when they
  * land in the SAME micro-batch (sorted: touches before conversions,
  * larger ids later, matching at-or-before with max-id tie-break). A
  * tie split across a batch boundary — or any late touch — leaves the
  * conversion attributed to the state at its arrival, reconciled by
  * the batch operator over the full log: bounded state's price,
  * identical to the funnel twin's contract.
  */
object AttributionStream {

  final case class TouchState(ts: Long, id: Long)
  final case class Attribution(key: String, conversionId: Long,
      touchId: Option[Long], lagMicros: Option[Long])

  /** Input rows: (userKey, eventType, eventTime, eventId). */
  def lastTouch(ds: Dataset[(String, String, Long, Long)],
      touchType: String, convertType: String): Dataset[Attribution] = {
    implicit val outEnc: Encoder[Attribution] = Encoders.product[Attribution]
    implicit val stEnc: Encoder[TouchState] = Encoders.product[TouchState]

    ds.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, events, state: GroupState[TouchState]) =>
          // time order; at equal time touches before conversions (the
          // at-or-before rule), larger ids later (max-id tie-break)
          val ordered = events.toSeq.sortBy { case (_, typ, t, id) =>
            (t, if (typ == touchType) 0 else 1, id)
          }
          var touch = state.getOption
          val out = Seq.newBuilder[Attribution]
          ordered.foreach { case (_, typ, t, id) =>
            if (typ == touchType) {
              val newer = touch.forall(s =>
                s.ts < t || (s.ts == t && s.id < id))
              if (newer) touch = Some(TouchState(t, id))
            } else if (typ == convertType) {
              out += Attribution(key, id, touch.map(_.id),
                touch.map(s => t - s.ts))
            }
          }
          touch.foreach(state.update)
          out.result().iterator
      }
  }
}
