package graft.core

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Live-HTTP spec for the `/metrics` scrape surface: starts the real
  * server on an ephemeral port and GETs it the way a Prometheus scraper
  * (or `curl`) would. */
class MetricsHttpSpec extends AnyFunSuite {

  test("serves reference-named series in Prometheus text format") {
    Metrics.reset()
    Metrics.observe("events_cdc", "loader_seconds", 12.5)
    Metrics.observe("events_cdc", "loader_seconds", 7.5)
    Metrics.add("events_cdc", "batcher_messages_processed", 10000L)
    Metrics.gauge("events_cdc", "loader_running", 1.0)
    val srv = MetricsHttp.start()
    try {
      val src = Source.fromURL(srv.url, "UTF-8")
      val body = try src.mkString finally src.close()
      assert(body.contains(
        """rsk_loader_seconds_sum{table="events_cdc"} 20"""))
      assert(body.contains(
        """rsk_loader_seconds_count{table="events_cdc"} 2"""))
      assert(body.contains(
        """rsk_loader_seconds_max{table="events_cdc"} 12.5"""))
      assert(body.contains(
        """rsk_batcher_messages_processed_sum{table="events_cdc"} 10000"""))
      assert(body.contains("""rsk_loader_running_sum{table="events_cdc"} 1"""))
      assert(body.contains("# TYPE rsk_loader_seconds summary"))
    } finally {
      srv.stop()
      Metrics.reset()
    }
  }

  test("label values are escaped and multiple tables sort stably") {
    Metrics.reset()
    Metrics.observe("a\"b\\c", "loader_seconds", 1.0)
    Metrics.observe("zz", "loader_seconds", 2.0)
    val out = MetricsHttp.render(Metrics.snapshot())
    assert(out.contains("""{table="a\"b\\c"}"""))
    assert(out.indexOf("""table="a\"b\\c"""") <
      out.indexOf("""table="zz""""))
    Metrics.reset()
  }
}
