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
      timestamp: String)

  private val progress = TrieMap.empty[String, Progress]

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    progress.put(p.name,
      Progress(p.batchId, p.numInputRows, p.processedRowsPerSecond, p.timestamp))
    // exported alongside the loader metrics (the reference's per-topic
    // lag gauge feeding its realtime calculation) — last value wins
    graft.core.Metrics.gauge(p.name, "loader_lag_rows",
      p.numInputRows.toDouble)
  }

  def lag(queryName: String): Option[Long] =
    progress.get(queryName).map(_.inputRows)

  /** Realtime iff the last micro-batch consumed at most `maxLagRows` —
    * i.e. the query is keeping up with the head of the stream (the
    * reference's `lag <= maxLag`, realtime_calculator.go:284-312). */
  def realtime(queryName: String): Boolean =
    lag(queryName).exists(_ <= maxLagRows)

  def snapshot: Map[String, Progress] = progress.toMap
}
