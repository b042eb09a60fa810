package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import scala.collection.concurrent.TrieMap
import scala.util.Random

/** S3 — schema-registry client (SURVEY §2.1; tipoca-stream
  * pkg/schemaregistry/schemaregistry.go:80-188): resolve writer schemas by
  * id, with a driver-side cache and jittered retry. Schemas are resolved on
  * the driver once per micro-batch and shipped to executors inside the
  * decode expression — executors never call the registry.
  */
trait SchemaFetcher {
  /** Avro schema JSON for a schema id. */
  def schemaById(id: Int): String
  /** (id, schema JSON) of the latest version for a subject. */
  def latest(subject: String): (Int, String)
}

/** Registry write path (schemaregistry.go:139-188 CreateSchema): register
  * a schema under a subject, returning its id — needed when the engine is
  * the *producer* of a topic (Job/audit signals). Registration is
  * idempotent: re-posting an identical schema returns the existing id. */
trait SchemaRegistrar {
  def createSchema(subject: String, schema: String): Int
}

/** In-memory fetcher/registrar for tests and file-sourced replays. */
final class StaticSchemaFetcher(
    byId: Map[Int, String],
    latestBySubject: Map[String, Int] = Map.empty)
    extends SchemaFetcher with SchemaRegistrar {

  private val registered = TrieMap.empty[Int, String]
  private val subjectLatest = TrieMap((latestBySubject.toSeq): _*)
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(
    (byId.keys ++ latestBySubject.values).maxOption.getOrElse(0) + 1)

  def schemaById(id: Int): String =
    byId.getOrElse(id, registered.getOrElse(id,
      throw new NoSuchElementException(s"schema id $id")))

  def latest(subject: String): (Int, String) = {
    val id = subjectLatest.getOrElse(subject,
      throw new NoSuchElementException(s"subject $subject"))
    (id, schemaById(id))
  }

  def createSchema(subject: String, schema: String): Int = synchronized {
    subjectLatest.get(subject)
      .filter(id => scala.util.Try(schemaById(id)).toOption.contains(schema))
      .getOrElse {
        val id = nextId.getAndIncrement()
        registered.put(id, schema)
        subjectLatest.put(subject, id)
        id
      }
  }
}

/** Confluent REST client with cache + retry (GET /schemas/ids/{id},
  * GET /subjects/{s}/versions/latest). Retry waits are jittered in
  * [minWait, maxWait] like the reference (schemaregistry.go:114-138). */
final class HttpSchemaFetcher(
    baseUrl: String,
    maxRetries: Int = 10,
    minWaitMs: Int = 2000,
    maxWaitMs: Int = 30000) extends SchemaFetcher with SchemaRegistrar {

  private val cache = TrieMap.empty[Int, String]
  private val client = HttpClient.newHttpClient()

  private def withRetry[T](op: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRetries) {
      try return op
      catch {
        case e: Throwable =>
          last = e
          attempt += 1
          if (attempt <= maxRetries)
            Thread.sleep(minWaitMs + Random.nextInt(maxWaitMs - minWaitMs))
      }
    }
    throw last
  }

  private def get(path: String): String = withRetry {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$baseUrl$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 300)
      throw new RuntimeException(s"registry $path -> ${resp.statusCode()}")
    resp.body()
  }

  private def field(json: String, name: String): String = {
    import org.json4s._
    (org.json4s.jackson.JsonMethods.parse(json) \ name) match {
      case JString(s) => s
      case JInt(i) => i.toString
      case v => v.toString
    }
  }

  def schemaById(id: Int): String =
    cache.getOrElseUpdate(id, field(get(s"/schemas/ids/$id"), "schema"))

  def latest(subject: String): (Int, String) = {
    val body = get(s"/subjects/$subject/versions/latest")
    val id = field(body, "id").toInt
    val schema = field(body, "schema")
    cache.putIfAbsent(id, schema)
    (id, schema)
  }

  /** POST /subjects/{subject}/versions (schemaregistry.go:139-188). The
    * registry deduplicates identical schemas per subject server-side. */
  def createSchema(subject: String, schema: String): Int = withRetry {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods.{compact, render}
    val body = compact(render("schema" -> schema))
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$baseUrl/subjects/$subject/versions"))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 300)
      throw new RuntimeException(
        s"registry POST /subjects/$subject/versions -> ${resp.statusCode()}")
    val id = field(resp.body(), "id").toInt
    cache.putIfAbsent(id, schema)
    id
  }
}
