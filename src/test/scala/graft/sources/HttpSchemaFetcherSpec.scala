package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** S3 HTTP client against a local in-process registry stub (JDK
  * HttpServer — no egress). */
class HttpSchemaFetcherSpec extends AnyFunSuite {

  private def withServer(test: (String, AtomicInteger) => Unit): Unit = {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/7", { ex =>
      hits.incrementAndGet()
      val body = """{"schema": "{\"type\": \"string\"}"}"""
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.createContext("/schemas/ids/404", { ex =>
      hits.incrementAndGet()
      ex.sendResponseHeaders(404, -1)
      ex.close()
    })
    server.createContext("/subjects/t-value/versions/latest", { ex =>
      val body = """{"id": 7, "schema": "{\"type\": \"string\"}"}"""
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.createContext("/subjects/new-value/versions", { ex =>
      // registry write path: POST {"schema": "..."} -> {"id": N}
      if (ex.getRequestMethod == "POST") {
        val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        lastPost.set(req)
        val body = """{"id": 99}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      } else ex.sendResponseHeaders(405, -1)
      ex.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  private val lastPost = new java.util.concurrent.atomic.AtomicReference[String]("")

  test("schemaById fetches, parses, and caches") {
    withServer { (url, hits) =>
      val f = new HttpSchemaFetcher(url, maxRetries = 0)
      assert(f.schemaById(7) == """{"type": "string"}""")
      assert(f.schemaById(7) == """{"type": "string"}""")
      assert(hits.get() == 1) // second call served from cache
    }
  }

  test("latest resolves subject and seeds the id cache") {
    withServer { (url, hits) =>
      val f = new HttpSchemaFetcher(url, maxRetries = 0)
      val (id, schema) = f.latest("t-value")
      assert(id == 7 && schema == """{"type": "string"}""")
      assert(f.schemaById(7) == schema)
      assert(hits.get() == 0) // id 7 never hit: seeded by latest()
    }
  }

  test("retries then surfaces the failure") {
    withServer { (url, hits) =>
      val f = new HttpSchemaFetcher(url, maxRetries = 2,
        minWaitMs = 1, maxWaitMs = 2)
      intercept[RuntimeException](f.schemaById(404))
      assert(hits.get() == 3) // initial + 2 retries
    }
  }

  test("createSchema POSTs the escaped schema and seeds the cache") {
    withServer { (url, hits) =>
      val f = new HttpSchemaFetcher(url, maxRetries = 0)
      val id = f.createSchema("new-value", """{"type": "string"}""")
      assert(id == 99)
      // schema JSON travels as an escaped string field
      assert(lastPost.get() == """{"schema":"{\"type\": \"string\"}"}""")
      assert(f.schemaById(99) == """{"type": "string"}""") // cache-seeded
      assert(hits.get() == 0)
    }
  }

  test("StaticSchemaFetcher registrar: create + latest round-trip, idempotent") {
    val f = new StaticSchemaFetcher(Map(7 -> "s7"), Map("t-value" -> 7))
    val id = f.createSchema("jobs-value", """{"type": "record"}""")
    assert(id > 7)
    assert(f.latest("jobs-value") == (id, """{"type": "record"}"""))
    assert(f.schemaById(id) == """{"type": "record"}""")
    // identical re-registration returns the same id
    assert(f.createSchema("jobs-value", """{"type": "record"}""") == id)
    // a changed schema gets a new id and becomes latest
    val id2 = f.createSchema("jobs-value", """{"type": "bytes"}""")
    assert(id2 != id && f.latest("jobs-value")._1 == id2)
    // pre-seeded subjects unaffected
    assert(f.latest("t-value") == (7, "s7"))
  }
}
