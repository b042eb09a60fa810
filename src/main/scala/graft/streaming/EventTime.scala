package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming extensions (SURVEY §2.5 T4/T10: the reference has
  * no event-time or stateful semantics — strict per-partition order and
  * last-writer-wins make them unnecessary for CDC — but the engine exposes
  * Spark's native support as first-class operators for the training-data
  * side: arrival-rate windows over document streams, sessionized user
  * activity, late-data tolerance via watermarks).
  */
object EventTime {

  /** Tumbling/sliding windowed counts with a watermark: the canonical
    * late-data-tolerant streaming aggregation. `tsCol` must be a timestamp
    * column. State is bounded by the watermark — Spark drops window state
    * older than it, so memory is O(active windows), not O(stream). */
  def windowedCounts(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      slideDuration: Option[String] = None,
      groupCols: Seq[String] = Nil): DataFrame = {
    val w = slideDuration match {
      case Some(slide) => window(col(tsCol), windowDuration, slide)
      case None => window(col(tsCol), windowDuration)
    }
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((w +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        groupCols.map(col) :+ col("n")): _*)
  }

  final case class SessionUpdate(
      key: String, sessionStartMs: Long, sessionEndMs: Long, events: Long)

  /** Public: encoder codegen instantiates it reflectively. */
  final case class SessionState(startMs: Long, lastMs: Long, events: Long)

  /** Session windows via `flatMapGroupsWithState` (T10 pattern): events
    * for a key belong to one session while inter-event gaps stay under
    * `gapMs`; a later event past the gap closes the previous session and
    * emits it. Input rows: (key, eventTimeMs). Gap-close only — for
    * open-session expiry (idle keys never seeing another event) use
    * [[sessionizeExpiring]], which adds an event-time GroupStateTimeout. */
  def sessionize(
      ds: Dataset[(String, Long)], gapMs: Long): Dataset[SessionUpdate] = {
    implicit val outEnc: Encoder[SessionUpdate] = Encoders.product[SessionUpdate]
    implicit val stEnc: Encoder[SessionState] = Encoders.product[SessionState]

    ds.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, events, state: GroupState[SessionState]) =>
          val times = events.map(_._2).toSeq.sorted
          val (closed, open) = times.foldLeft(
            (Vector.empty[SessionState], state.getOption)) {
            case ((done, cur), t) => cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                (done, Some(s.copy(lastMs = t, events = s.events + 1)))
              case Some(s) =>
                (done :+ s, Some(SessionState(t, t, 1)))
              case None =>
                (done, Some(SessionState(t, t, 1)))
            }
          }
          open.foreach(state.update)
          closed.iterator.map(s =>
            SessionUpdate(key, s.startMs, s.lastMs, s.events))
      }
  }

  /** [[sessionize]] + idle expiry: an open session whose key sees no event
    * before the watermark passes `lastMs + idleMs` is flushed via an
    * event-time GroupStateTimeout — so every session is eventually
    * emitted, bounding state for keys that simply stop (the gap in the
    * gap-close-only variant). `watermarkDelay` is the late-data allowance
    * (e.g. "10 seconds"). */
  def sessionizeExpiring(
      ds: Dataset[(String, Long)], gapMs: Long,
      watermarkDelay: String, idleMs: Long): Dataset[SessionUpdate] = {
    implicit val outEnc: Encoder[SessionUpdate] = Encoders.product[SessionUpdate]
    implicit val stEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val rowEnc: Encoder[(String, Long, java.sql.Timestamp)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
        Encoders.TIMESTAMP)

    ds.toDF("key", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, events, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(key, s.startMs, s.lastMs, s.events))
          } else {
            val times = events.map(_._2).toSeq.sorted
            val (closed, open) = times.foldLeft(
              (Vector.empty[SessionState], state.getOption)) {
              case ((done, cur), t) => cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  (done, Some(s.copy(lastMs = t, events = s.events + 1)))
                case Some(s) =>
                  (done :+ s, Some(SessionState(t, t, 1)))
                case None =>
                  (done, Some(SessionState(t, t, 1)))
              }
            }
            open.foreach { s =>
              state.update(s)
              // expire once the watermark passes lastMs + idleMs (the
              // timestamp must sit beyond the current watermark)
              state.setTimeoutTimestamp(
                math.max(s.lastMs + idleMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator.map(s =>
              SessionUpdate(key, s.startMs, s.lastMs, s.events))
          }
      }
  }
}
