package graft.quality

import graft.SparkSuite

class ChecksSpec extends SparkSuite {
  import spark.implicits._

  test("notNull / unique / relationships / isBetween / isNonNegative flag violations") {
    val child = Seq((Some(1L), -5.0), (Some(1L), 2.0), (Some(9L), 3.0), (None, 200.0))
      .toDF("fk", "v")
    val parent = Seq(1L, 2L).toDF("pk")

    assert(Checks.notNull(child, "fk").count() == 1)
    assert(Checks.unique(child, "fk").count() == 1)          // fk=1 twice
    assert(Checks.relationships(child, "fk", parent, "pk").count() == 1) // fk=9
    assert(Checks.isBetween(child, "v", 0, 100).count() == 2) // -5 and 200
    assert(Checks.isNonNegative(child, "v").count() == 1)
  }

  test("acceptedValues groups out-of-domain values, passes nulls and allowed") {
    val df = Seq(Some("a"), Some("a"), Some("b"), Some("zz"), Some("zz"),
      Some("yy"), None).toDF("c")
    val out = Checks.acceptedValues(df, "c", Seq("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("zz" -> 2L, "yy" -> 1L)) // NULL is not_null's job
  }

  test("freshness passes within SLA, fails beyond") {
    import org.apache.spark.sql.functions._
    val df = Seq("2026-01-01 00:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("loaded_at"))
    val asOfFresh = lit("2026-01-01 10:00:00").cast("timestamp")
    val asOfStale = lit("2026-01-03 10:00:00").cast("timestamp")
    assert(Checks.freshness(df, "loaded_at", 24, asOfFresh).count() == 0)
    assert(Checks.freshness(df, "loaded_at", 24, asOfStale).count() == 1)
  }

  test("freshnessLevels: fresh → empty, warn band, error band, empty source") {
    import org.apache.spark.sql.functions._
    val df = Seq("2026-01-01 00:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("loaded_at"))
    def sev(asOf: String, src: org.apache.spark.sql.DataFrame = df): Seq[String] =
      Checks.freshnessLevels(src, "loaded_at", 24, 48,
          lit(asOf).cast("timestamp"))
        .select("severity").as[String].collect().toSeq
    assert(sev("2026-01-01 10:00:00").isEmpty)            // 10h: fresh
    assert(sev("2026-01-02 10:00:00") == Seq("warn"))     // 34h: warn band
    assert(sev("2026-01-03 10:00:00") == Seq("error"))    // 58h: error band
    assert(sev("2026-01-01 10:00:00", df.limit(0)) == Seq("error")) // empty source
  }

  test("run returns per-check violation counts") {
    val df = Seq((1L, 1.0)).toDF("k", "v")
    val res = Checks.run(Seq(
      "k_not_null" -> Checks.notNull(df, "k"),
      "v_non_negative" -> Checks.isNonNegative(df, "v")))
    assert(res == Seq("k_not_null" -> 0L, "v_non_negative" -> 0L))
  }
}
