package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Transport contract for [[PagedSource]]: one page of raw JSON records
  * for one entity. Exactly three outcomes, mirroring what the
  * reference's extractor distinguishes
  * (scripts/extract_measurements.py:88-147):
  * data, not-found (its 404 → "no data for this sensor"), and transient
  * error (its RequestException → retry with backoff).
  *
  * Implementations are constructed reflectively ON THE EXECUTOR (one per
  * task) and handed the `path` option via [[open]] — a real HTTP client
  * would build its connection pool there; nothing transport-shaped is
  * ever serialized from the driver.
  */
trait PageClient {
  def open(path: String): Unit
  def fetch(entity: Long, page: Int, limit: Int): PageResult
  def close(): Unit = ()
}

sealed trait PageResult
case class PageOk(records: Seq[String]) extends PageResult
case object PageNotFound extends PageResult
case class PageError(message: String) extends PageResult

/** Directory-backed [[PageClient]] (the sandbox has no egress): entity
  * `e`'s page `p` is `<path>/<e>/page_<p>.ndjson`, one JSON record per
  * line; a missing entity directory is not-found; a missing page file is
  * an empty (short) page. Transient failures are scriptable for retry
  * tests: `<path>/<e>/page_<p>.failures` containing `k` makes the first
  * `k` fetches of that page fail with [[PageError]] — per-client-instance
  * attempt counting, like a flaky network that recovers.
  */
class FixturePageClient extends PageClient {
  private var root: Path = _
  private val attempts = scala.collection.mutable.HashMap[(Long, Int), Int]()

  override def open(path: String): Unit = { root = Path.of(path) }

  override def fetch(entity: Long, page: Int, limit: Int): PageResult = {
    val dir = root.resolve(entity.toString)
    if (!Files.isDirectory(dir)) return PageNotFound
    val failFile = dir.resolve(s"page_$page.failures")
    if (Files.isRegularFile(failFile)) {
      val planned = Files.readString(failFile).trim.toInt
      val n = attempts.getOrElse((entity, page), 0)
      if (n < planned) {
        attempts((entity, page)) = n + 1
        return PageError(s"injected transient failure ${n + 1}/$planned")
      }
    }
    val pageFile = dir.resolve(s"page_$page.ndjson")
    if (!Files.isRegularFile(pageFile)) PageOk(Nil) // past the last page
    else PageOk(Files.readAllLines(pageFile).asScala.toSeq.filter(_.nonEmpty).take(limit))
  }
}

/** Live HTTP [[PageClient]] over `java.net.http` (JDK built-in, no new
  * dependency) — the real-transport twin of [[FixturePageClient]],
  * matching the reference extractor request-for-request
  * (scripts/extract_measurements.py:66-147):
  *
  *  - URL `<path>/<entity>/measurements?page=<p>&limit=<l>` where `path`
  *    is the API prefix up to the entity collection (the reference's
  *    `f"{api_url}/sensors/{sensor_id}/measurements"` with
  *    `path = s"$apiUrl/sensors"`);
  *  - 15 s timeout (reference `timeout=15`);
  *  - 404 → [[PageNotFound]] ("no data for this sensor");
  *  - any other non-2xx, or any connect/read failure → [[PageError]],
  *    which [[PagedSource]]'s reader turns into the 1×/2×/4× backoff
  *    micro-retry ladder (reference `time.sleep(2**attempt)`);
  *  - 2xx → the `results` array of the JSON envelope, one raw-JSON
  *    string per element (absent/null `results` → empty page, the
  *    reference's `.get("results", [])`).
  *
  * Constructed reflectively on the executor like every client — one
  * `HttpClient` (connection pool) per task, never serialized.
  */
class HttpPageClient extends PageClient {
  private var base: String = _
  private var http: java.net.http.HttpClient = _

  override def open(path: String): Unit = {
    base = path.stripSuffix("/")
    http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(15))
      .build()
  }

  override def fetch(entity: Long, page: Int, limit: Int): PageResult =
    try {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$base/$entity/measurements?page=$page&limit=$limit"))
        .timeout(java.time.Duration.ofSeconds(15))
        .GET().build()
      val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case 404 => PageNotFound
        case ok if ok / 100 == 2 =>
          val envelope = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(resp.body())
          val results = if (envelope == null) null else envelope.get("results")
          if (results == null || results.isNull) PageOk(Nil)
          else PageOk(results.elements().asScala.map(_.toString).toSeq)
        case status => PageError(s"HTTP $status for entity $entity page $page")
      }
    } catch {
      // connect refused, read timeout, malformed body — all transient to
      // the retry ladder (the reference catches RequestException the same)
      case e: Exception => PageError(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}

/** Dedup-key extraction for the in-flight first-wins dedup: a key spec
  * is comma-separated dot-paths into each JSON record, joined with "-" —
  * `"period.datetimeFrom.utc,value"` reproduces the reference's
  * `f"{utc_time}-{value}"` key (extract_measurements.py:115-118).
  * Missing/null path segments render as "null", same as the reference's
  * safe `or {}` traversal producing None.
  */
object RecordKey {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def eval(keySpec: String, json: String): String = {
    val node =
      try mapper.readTree(json)
      catch { case _: Exception => null }
    keySpec.split(",").map { rawPath =>
      var cur = node
      rawPath.trim.split("\\.").foreach { seg =>
        cur = if (cur == null) null else cur.get(seg)
      }
      if (cur == null || cur.isNull) "null"
      else if (cur.isValueNode) cur.asText()
      else cur.toString
    }.mkString("-")
  }
}
