package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Behavior.funnel]] (T10 stateful-ops
  * family): per-user ordered-funnel progress maintained incrementally
  * with `flatMapGroupsWithState`. State per user is ONE fixed-size array
  * — the earliest valid timestamp per stage — so state size is
  * O(users × stages) regardless of event volume.
  *
  * Exactness contract: stage i's batch semantics ("earliest stage-i
  * event at-or-after the final stage i−1 time") are replayed exactly
  * when events are processed in event-time order (each micro-batch is
  * sorted here; cross-batch order is the source's watermark contract —
  * the same in-order assumption the sessionizer's gap-close makes). A
  * stage-0 event arriving LATE, after a downstream event it would have
  * validated was discarded, under-counts that user until replay — the
  * price of bounded state; the batch operator over the full log is the
  * reconciliation path, exactly as CDC merge reconciles the stream.
  */
object FunnelStream {

  /** Earliest valid per-stage times; [[Unset]] = stage not yet reached. */
  final case class FunnelState(times: Seq[Long])
  /** Emitted whenever a user's progress deepens. */
  final case class FunnelUpdate(key: String, stagesReached: Int,
      lastStageTime: Long)

  val Unset: Long = Long.MaxValue

  /** Input rows: (userKey, eventType, eventTime). Emits an update per
    * user per trigger when the reached-stage count grew. */
  def funnelByUser(ds: Dataset[(String, String, Long)],
      stages: Seq[String]): Dataset[FunnelUpdate] = {
    implicit val outEnc: Encoder[FunnelUpdate] = Encoders.product[FunnelUpdate]
    implicit val stEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
    val stageIdx = stages.zipWithIndex.toMap

    ds.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, events, state: GroupState[FunnelState]) =>
          val init = state.getOption
            .map(_.times.toVector)
            .getOrElse(Vector.fill(stages.size)(Unset))
          // sort by (time, stage) so an equal-time earlier stage
          // validates the later one ("at-or-after" includes equality)
          val ordered = events.flatMap { case (_, typ, t) =>
            stageIdx.get(typ).map(i => (t, i))
          }.toSeq.sorted
          val before = init.count(_ != Unset)
          val after = ordered.foldLeft(init) { case (ts, (t, i)) =>
            if (i == 0) { if (t < ts(0)) ts.updated(0, t) else ts }
            else if (ts(i - 1) != Unset && t >= ts(i - 1) && t < ts(i))
              ts.updated(i, t)
            else ts
          }
          state.update(FunnelState(after))
          val reached = after.count(_ != Unset)
          if (reached > before)
            Iterator.single(
              FunnelUpdate(key, reached, after(reached - 1)))
          else Iterator.empty
      }
  }
}
