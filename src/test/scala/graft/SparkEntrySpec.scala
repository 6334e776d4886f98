package graft

class SparkEntrySpec extends SparkSuite {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (none are rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("all queries run on sf0.001 and produce stable schemas") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      // non-chk queries must return rows; chk_* are violation queries (0 = pass)
      val n = df.count()
      // chk_* / j3_* are violation queries (0 = pass);
      // the production LSH banding (16 matching sign bits per band) has
      // legitimately zero recall on sf0.001's 50 vectors — its oracle
      // twin pins the exact (empty) result instead
      if (!name.startsWith("chk_") && !name.startsWith("j3_") &&
          name != "x_embed_neardup_lsh")
        assert(n > 0, s"$name returned no rows")
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
    }
  }
}
