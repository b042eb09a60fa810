package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import scala.collection.concurrent.TrieMap

/** O4/R9 — lag tracking and "realtime" determination (tipoca-stream
  * controllers/realtime_calculator.go:49-346): a sink group is realtime
  * when its per-topic lag is at or below threshold. In Spark the per-query
  * progress stream replaces the Kafka admin-client lag probes; attach this
  * listener to the session and ask [[realtime]].
  */
final class RealtimeTracker(maxLagRows: Long = 100) extends StreamingQueryListener {

  final case class Progress(
      batchId: Long,
      inputRows: Long,
      processedRowsPerSecond: Double,
      timestamp: String,
      offsetLag: Option[Long])

  private val progress = TrieMap.empty[String, Progress]

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    // true consumer lag = Σ sources (latestOffset − endOffset): how far the
    // head of the stream is beyond what this batch consumed — the same
    // quantity the reference reads from the Kafka admin client. Sources
    // whose offsets don't expose totals (null latestOffset) contribute None.
    val oLag = {
      val per = p.sources.toSeq.map(s =>
        for (l <- RealtimeTracker.offsetTotal(s.latestOffset);
             e <- RealtimeTracker.offsetTotal(s.endOffset)) yield (l - e).max(0L))
      if (per.nonEmpty && per.forall(_.isDefined)) Some(per.flatten.sum) else None
    }
    progress.put(p.name,
      Progress(p.batchId, p.numInputRows, p.processedRowsPerSecond,
        p.timestamp, oLag))
    // batch size is throughput, not lag — gauge it under its real name
    graft.core.Metrics.gauge(p.name, "batch_input_rows",
      p.numInputRows.toDouble)
    // the reference's per-topic lag gauge (offset lag), when derivable
    oLag.foreach(l =>
      graft.core.Metrics.gauge(p.name, "loader_lag_offsets", l.toDouble))
  }

  /** Rows consumed by the last micro-batch (throughput proxy — kept as the
    * realtime signal for sources that don't publish a latestOffset). */
  def lag(queryName: String): Option[Long] =
    progress.get(queryName).map(_.inputRows)

  /** True offset lag (head − consumed) when the source publishes it. */
  def offsetLag(queryName: String): Option[Long] =
    progress.get(queryName).flatMap(_.offsetLag)

  /** Realtime iff the query is keeping up with the head of the stream
    * (the reference's `lag <= maxLag`, realtime_calculator.go:284-312):
    * judged on true offset lag when the source publishes it, else on the
    * last batch's row count (a batch at most maxLagRows big means the
    * backlog fit in one trigger). */
  def realtime(queryName: String): Boolean =
    progress.get(queryName).exists(p =>
      p.offsetLag.getOrElse(p.inputRows) <= maxLagRows)

  def snapshot: Map[String, Progress] = progress.toMap
}

object RealtimeTracker {
  /** Total offset from a progress-event offset string: a bare long for
    * MemoryStream/rate sources, or Kafka's topic→partition→offset JSON
    * map — totalled by summing values whose KEY is a quoted partition
    * number (`"0": 5`). Restricting to quoted-digit keys is what keeps
    * arbitrary numeric fields (e.g. a `"timestamp":`/`"offset":` pair in
    * some other source's JSON) from polluting the sum: such sources
    * return None and [[RealtimeTracker.realtime]] falls back to the
    * row-count signal. */
  private[streaming] def offsetTotal(s: String): Option[Long] = {
    if (s == null) None
    else scala.util.Try(s.trim.toLong).toOption.orElse {
      val vals = "\"(\\d+)\"\\s*:\\s*(-?\\d+)".r.findAllMatchIn(s)
        .map(_.group(2).toLong).toSeq
      if (vals.nonEmpty) Some(vals.sum) else None
    }
  }
}
