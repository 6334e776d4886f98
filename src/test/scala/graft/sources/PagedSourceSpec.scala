package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** S4/S5 extractor semantics on the DSv2 paged source, driven through
  * the fixture transport: pagination to the short page, 404→empty,
  * in-flight first-wins dedup, backoff-retry recovery, fail-loud on
  * exhausted retries, point-lookup unwrap, and one-partition-per-entity
  * distribution.
  */
class PagedSourceSpec extends SparkSuite {
  import spark.implicits._

  private def rec(id: Int, utc: String, v: Double): String =
    s"""{"id":$id,"period":{"datetimeFrom":{"utc":"$utc"}},"value":$v}"""

  private def writePages(root: Path, entity: Long, pages: Seq[Seq[String]],
                         failures: Map[Int, Int] = Map.empty): Unit = {
    val dir = root.resolve(entity.toString)
    Files.createDirectories(dir)
    pages.zipWithIndex.foreach { case (lines, i) =>
      Files.writeString(dir.resolve(s"page_${i + 1}.ndjson"), lines.mkString("\n"))
    }
    failures.foreach { case (p, k) =>
      Files.writeString(dir.resolve(s"page_$p.failures"), k.toString)
    }
  }

  private def read(root: Path, ids: String, extra: (String, String)*): DataFrame = {
    val base = spark.read.format("graft-paged")
      .option("client", classOf[FixturePageClient].getName)
      .option("path", root.toString)
      .option("entityIds", ids)
      .option("limit", "2")
      .option("backoffMs", "1") // keep retry tests fast; semantics unchanged
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("paginates until the short page; missing entity dir is 404-empty") {
    val root = Files.createTempDirectory("paged")
    writePages(root, 7L, Seq(
      Seq(rec(1, "2026-01-01T00:00:00Z", 1.0), rec(2, "2026-01-01T01:00:00Z", 2.0)), // full
      Seq(rec(3, "2026-01-01T02:00:00Z", 3.0)))) // short → last
    val df = read(root, "7,8") // 8 has no directory
    assert(df.rdd.getNumPartitions == 2) // one partition per entity
    val rows = df.select($"entity_id", get_json_object($"record", "$.id").cast("int"))
      .as[(Long, Int)].collect().sorted
    assert(rows.toSeq == Seq((7L, 1), (7L, 2), (7L, 3)))
  }

  test("in-flight first-wins dedup on the reference's utc-value key, across pages") {
    val root = Files.createTempDirectory("paged_dedup")
    writePages(root, 5L, Seq(
      Seq(rec(1, "2026-01-01T00:00:00Z", 9.1), rec(2, "2026-01-01T01:00:00Z", 9.2)),
      Seq(rec(3, "2026-01-01T00:00:00Z", 9.1), rec(4, "2026-01-01T02:00:00Z", 9.1)))) // 3 dups 1
    val ids = read(root, "5", "dedupKey" -> "period.datetimeFrom.utc,value")
      .select(get_json_object($"record", "$.id").cast("int")).as[Int].collect().sorted
    assert(ids.toSeq == Seq(1, 2, 4)) // record 3 dropped: same (utc, value) as 1
  }

  test("transient failures below the retry budget recover via backoff") {
    val root = Files.createTempDirectory("paged_retry")
    writePages(root, 3L, Seq(Seq(rec(1, "2026-01-01T00:00:00Z", 1.5))),
      failures = Map(1 -> 2)) // 2 failures, budget 3 → third attempt succeeds
    val n = read(root, "3").count()
    assert(n == 1)
  }

  test("exhausted retries fail the task loudly — no silent partial extraction") {
    val root = Files.createTempDirectory("paged_fail")
    writePages(root, 4L, Seq(Seq(rec(1, "2026-01-01T00:00:00Z", 1.0))),
      failures = Map(1 -> 99))
    val e = intercept[Exception](read(root, "4").count())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("exhausted"))))
  }

  test("point-lookup mode (maxPages=1, limit=1) unwraps results[0] per entity") {
    val root = Files.createTempDirectory("paged_point")
    writePages(root, 1L, Seq(Seq(rec(10, "2026-01-01T00:00:00Z", 1.0)),
      Seq(rec(11, "2026-01-01T01:00:00Z", 2.0)))) // page 2 must NOT be read
    writePages(root, 2L, Seq(Seq(rec(20, "2026-01-02T00:00:00Z", 3.0))))
    val rows = read(root, "1,2,9", "maxPages" -> "1", "limit" -> "1")
      .select($"entity_id", get_json_object($"record", "$.id").cast("int"))
      .as[(Long, Int)].collect().sorted
    assert(rows.toSeq == Seq((1L, 10), (2L, 20))) // 9 absent → None, page 2 of 1 unread
  }

  test("records flow into the existing envelope parsing (bronze integration)") {
    val root = Files.createTempDirectory("paged_bronze")
    writePages(root, 42L, Seq(Seq(rec(1, "2026-03-01T05:00:00Z", 7.25))))
    val parsed = read(root, "42").select($"entity_id",
      get_json_object($"record", "$.period.datetimeFrom.utc").cast("timestamp").as("utc"),
      get_json_object($"record", "$.value").cast("double").as("value"))
    val r = parsed.collect().head
    assert(r.getAs[Long]("entity_id") == 42L && r.getAs[Double]("value") == 7.25)
    assert(r.getAs[java.sql.Timestamp]("utc").toInstant.toString == "2026-03-01T05:00:00Z")
  }
}
