package graft.streaming

import graft.core.Metrics
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-engine feed for [[graft.core.Metrics]] — the collector half
  * of the reference's Prometheus surface (REDSHIFTSINK.md:115–181):
  *
  *  - `loader_running` gauge per query (1 on start / 0 on termination —
  *    the reference's rsk_loader_running);
  *  - `trigger_seconds` + `input_rows` per micro-batch from the engine's
  *    own progress events (the engine-measured complement of the
  *    phase/byte metrics processBatch records from inside the batch).
  *
  * Register once per session:
  * {{{ spark.streams.addListener(new MetricsListener()) }}}
  * Queries are tagged by their query name ([[CdcStream.start]] names
  * them `graft-cdc-<schema>-<table>`, so the tag is stable across
  * restarts, unlike run ids).
  */
final class MetricsListener extends StreamingQueryListener {
  import StreamingQueryListener._

  // terminated events carry no name — remember it from the start event
  private val names =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, String]()

  private def tag(id: java.util.UUID, name: String): String =
    Option(name).filter(_.nonEmpty).getOrElse(id.toString)

  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    names.put(e.id, tag(e.id, e.name))
    Metrics.gauge(tag(e.id, e.name), "loader_running", 1.0)
  }

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val t = tag(e.progress.id, e.progress.name)
    Option(e.progress.durationMs.get("triggerExecution")).foreach(ms =>
      Metrics.observe(t, "trigger_seconds", ms.toDouble / 1000.0))
    Metrics.add(t, "input_rows", e.progress.numInputRows)
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    val t = Option(names.remove(e.id)).getOrElse(e.id.toString)
    Metrics.gauge(t, "loader_running", 0.0)
  }
}
