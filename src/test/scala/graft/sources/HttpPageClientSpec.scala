package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** S4/S5 over the LIVE transport: [[HttpPageClient]] against an
  * in-process `com.sun.net.httpserver` stub (JDK-only, no egress)
  * serving the reference API shape
  * (`/sensors/<id>/measurements?page&limit` → `{"results":[...]}`,
  * scripts/extract_measurements.py:72-98). Covers real-socket
  * pagination, 404→empty, envelope edge cases, and the flaky-then-OK
  * sequence proving the 1×/2×/4× backoff ladder end-to-end with
  * observed inter-request gaps.
  */
class HttpPageClientSpec extends SparkSuite {
  import spark.implicits._

  private def rec(id: Int, utc: String, v: Double): String =
    s"""{"id":$id,"period":{"datetimeFrom":{"utc":"$utc"}},"value":$v}"""

  /** Stub API: pages per entity, scriptable failures-before-success per
    * (entity, page), and an arrival log for backoff verification.
    */
  private class StubApi(pages: Map[Long, Seq[Seq[String]]],
                        failFirst: Map[(Long, Int), Int] = Map.empty) {
    private val attempts = new ConcurrentHashMap[(Long, Int), AtomicInteger]()
    val arrivalsNanos = new ConcurrentHashMap[(Long, Int), java.util.List[Long]]()

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sensors", (x: HttpExchange) => handle(x))
    server.start()
    val baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}/sensors"

    private def handle(x: HttpExchange): Unit = {
      val parts = x.getRequestURI.getPath.split("/") // "", sensors, <id>, measurements
      val entity = parts(2).toLong
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
        .split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); (k, v)
        }.toMap
      val page = q.getOrElse("page", "1").toInt
      val limit = q.getOrElse("limit", "1000").toInt

      arrivalsNanos.computeIfAbsent((entity, page),
        _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]()))
        .add(System.nanoTime())
      val n = attempts.computeIfAbsent((entity, page), _ => new AtomicInteger()).incrementAndGet()

      def respond(status: Int, body: String): Unit = {
        val bytes = body.getBytes("UTF-8")
        x.sendResponseHeaders(status, bytes.length.toLong)
        x.getResponseBody.write(bytes)
        x.close()
      }
      if (n <= failFirst.getOrElse((entity, page), 0)) respond(500, """{"error":"boom"}""")
      else pages.get(entity) match {
        case None => respond(404, """{"detail":"not found"}""")
        case Some(ps) =>
          // page is 1-based; past-the-end pages are empty result lists
          val records = if (page <= ps.length) ps(page - 1).take(limit) else Nil
          respond(200, records.mkString("""{"results":[""", ",", "]}"))
      }
    }

    def stop(): Unit = server.stop(0)
  }

  private def read(baseUrl: String, ids: String, extra: (String, String)*): DataFrame = {
    val base = spark.read.format("graft-paged")
      .option("client", classOf[HttpPageClient].getName)
      .option("path", baseUrl)
      .option("entityIds", ids)
      .option("limit", "2")
      .option("backoffMs", "1")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("live HTTP: paginates to the short page; 404 entity is empty; real sockets") {
    val api = new StubApi(Map(
      7L -> Seq(
        Seq(rec(1, "2026-01-01T00:00:00Z", 1.0), rec(2, "2026-01-01T01:00:00Z", 2.0)),
        Seq(rec(3, "2026-01-01T02:00:00Z", 3.0)))))
    try {
      val df = read(api.baseUrl, "7,8") // entity 8 → 404
      assert(df.rdd.getNumPartitions == 2)
      val rows = df.select($"entity_id", get_json_object($"record", "$.id").cast("int"))
        .as[(Long, Int)].collect().sorted
      assert(rows.toSeq == Seq((7L, 1), (7L, 2), (7L, 3)))
    } finally api.stop()
  }

  test("live HTTP: 500-500-200 recovers through the backoff ladder (observed gaps 1x then 2x)") {
    val backoffMs = 60L
    val api = new StubApi(
      Map(3L -> Seq(Seq(rec(1, "2026-01-01T00:00:00Z", 1.5)))),
      failFirst = Map((3L, 1) -> 2))
    try {
      val n = read(api.baseUrl, "3", "backoffMs" -> backoffMs.toString).count()
      assert(n == 1)
      val t = api.arrivalsNanos.get((3L, 1)).asScala.toSeq
      assert(t.length == 3, s"expected 3 attempts, saw ${t.length}")
      val gap1 = (t(1) - t(0)) / 1e6
      val gap2 = (t(2) - t(1)) / 1e6
      // ladder: sleep backoff·2^(attempt-1) → gaps ≥ 60 ms then ≥ 120 ms
      assert(gap1 >= backoffMs, s"first retry gap $gap1 ms < $backoffMs ms")
      assert(gap2 >= 2 * backoffMs, s"second retry gap $gap2 ms < ${2 * backoffMs} ms")
    } finally api.stop()
  }

  test("live HTTP: exhausted retries fail the task loudly") {
    val api = new StubApi(
      Map(4L -> Seq(Seq(rec(1, "2026-01-01T00:00:00Z", 1.0)))),
      failFirst = Map((4L, 1) -> 99))
    try {
      val e = intercept[Exception](read(api.baseUrl, "4").count())
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("exhausted"))))
      // initial attempt + 3 retries, then no more traffic
      assert(api.arrivalsNanos.get((4L, 1)).size == 4)
    } finally api.stop()
  }

  test("live HTTP: connection refused is transient → error after retries, not a hang") {
    // a port with no listener: every attempt is a connect failure
    val unbound = {
      val s = new java.net.ServerSocket(0)
      val p = s.getLocalPort; s.close(); p
    }
    val e = intercept[Exception](
      read(s"http://127.0.0.1:$unbound/sensors", "1").count())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("exhausted"))))
  }

  test("live HTTP: missing results key and point-lookup unwrap") {
    // entity 9 serves an envelope with no results → empty, not a crash
    val api = new StubApi(Map(
      1L -> Seq(Seq(rec(10, "2026-01-01T00:00:00Z", 1.0)),
        Seq(rec(11, "2026-01-01T01:00:00Z", 2.0))),
      2L -> Seq(Seq(rec(20, "2026-01-02T00:00:00Z", 3.0)))))
    try {
      val rows = read(api.baseUrl, "1,2", "maxPages" -> "1", "limit" -> "1")
        .select($"entity_id", get_json_object($"record", "$.id").cast("int"))
        .as[(Long, Int)].collect().sorted
      assert(rows.toSeq == Seq((1L, 10), (2L, 20))) // page 2 of entity 1 unread
    } finally api.stop()

    // dedicated empty-envelope client check (no "results" member at all)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sensors", (x: HttpExchange) => {
      val bytes = """{"meta":{"found":0}}""".getBytes("UTF-8")
      x.sendResponseHeaders(200, bytes.length.toLong)
      x.getResponseBody.write(bytes); x.close()
    })
    server.start()
    try {
      val c = new HttpPageClient
      c.open(s"http://127.0.0.1:${server.getAddress.getPort}/sensors")
      assert(c.fetch(9L, 1, 10) == PageOk(Nil))
    } finally server.stop(0)
  }
}
