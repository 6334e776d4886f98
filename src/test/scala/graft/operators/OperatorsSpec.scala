package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{Keys, Numeric}

class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  test("SCD-2 history: change intervals, null-safe attr compare, open tail") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "u1", Some("A"), "2026-01-01 00:00:00"),
      (2L, "u1", Some("A"), "2026-01-02 00:00:00"), // no change → folded
      (3L, "u1", Some("B"), "2026-01-03 00:00:00"), // change
      (4L, "u1", Some("A"), "2026-01-04 00:00:00"), // back to A = new interval
      (5L, "u2", None,      "2026-01-01 00:00:00"), // NULL start
      (6L, "u2", None,      "2026-01-02 00:00:00"), // NULL→NULL: no change
      (7L, "u2", Some("C"), "2026-01-03 00:00:00")) // NULL→C: change
      .toDF("id", "user", "attr", "ts_s")
      .select(col("id"), col("user"), col("attr"),
        col("ts_s").cast("timestamp").as("ts"))
    val h = Scd.type2History(df, Seq("user"), "ts", Seq("attr"), col("id"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString)))
      .toSet
    assert(h == Set(
      ("u1", Some("A"), "2026-01-01 00:00:00.0", Some("2026-01-03 00:00:00.0")),
      ("u1", Some("B"), "2026-01-03 00:00:00.0", Some("2026-01-04 00:00:00.0")),
      ("u1", Some("A"), "2026-01-04 00:00:00.0", None),
      ("u2", None,      "2026-01-01 00:00:00.0", Some("2026-01-03 00:00:00.0")),
      ("u2", Some("C"), "2026-01-03 00:00:00.0", None)))
  }

  test("latestWins keeps exactly the newest row per key, tie-broken by id") {
    val df = Seq(
      (1L, "a", 10, 1L), (2L, "a", 20, 1L), (3L, "a", 20, 1L), // key 1: ties on ord=20 → id 3
      (4L, "b", 5, 2L)
    ).toDF("id", "v", "ord", "key")
    val out = Dedup.latestWins(df, Seq("key"), Seq(col("ord"), col("id")))
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(3L, 4L))
  }

  test("latestWins is idempotent") {
    val df = Seq((1L, 1L, 1), (2L, 1L, 2), (3L, 2L, 1)).toDF("id", "key", "ord")
    val once = Dedup.latestWins(df, Seq("key"), Seq(col("ord"), col("id")))
    val twice = Dedup.latestWins(once, Seq("key"), Seq(col("ord"), col("id")))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("firstWinsByMin keeps min tiebreak per composite key") {
    val df = Seq((10L, "x", 1.0), (7L, "x", 1.0), (9L, "y", 2.0))
      .toDF("event_id", "k1", "k2")
    val out = Dedup.firstWinsByMin(df, Seq("k1", "k2"), "event_id")
      .orderBy("k1").as[(String, Double, Long)].collect()
    assert(out.toSeq == Seq(("x", 1.0, 7L), ("y", 2.0, 9L)))
  }

  test("upsert replaces matched keys, inserts new, keeps unmatched; replay-idempotent") {
    val existing = Seq((1L, "old1"), (2L, "old2")).toDF("key", "v")
    val batch = Seq((2L, "new2"), (3L, "new3")).toDF("key", "v")
    val once = Merge.upsert(existing, batch, Seq("key"))
    assert(once.as[(Long, String)].collect().toSet ==
      Set((1L, "old1"), (2L, "new2"), (3L, "new3")))
    val twice = Merge.upsert(once, batch, Seq("key"))
    assert(twice.collect().toSet == once.collect().toSet)
  }

  test("conditionalAvg pivots with SQL null-skipping avg") {
    val df = Seq(("g", "a", 1.0), ("g", "a", 3.0), ("g", "b", 10.0))
      .toDF("grp", "typ", "v")
    val out = Pivot.conditionalAvg(df, Seq(col("grp")), col("typ"), col("v"),
      Seq("a", "b", "c"))
    val r = out.collect().head
    assert(r.getAs[Double]("avg_a") == 2.0)
    assert(r.getAs[Double]("avg_b") == 10.0)
    assert(r.isNullAt(r.fieldIndex("avg_c"))) // no 'c' rows → NULL, not 0
  }

  test("surrogateKey replicates dbt_utils: md5 of '-'-joined with null sentinel") {
    val df = Seq((Some(5L), "x"), (None, "y")).toDF("a", "b")
    val got = df.select(Keys.surrogateKey(col("a"), col("b")).as("k"))
      .as[String].collect().toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == Seq(md5hex("5-x"), md5hex(s"${Keys.NullSentinel}-y")))
  }

  test("scaledSum/scaledAvg are exact on 2-decimal data and null-skipping") {
    val df = Seq(Some(0.1), Some(0.2), Some(0.3), None).toDF("v")
    val r = df.agg(
      Numeric.scaledSum(col("v")).as("s"),
      Numeric.scaledAvg(col("v")).as("a")).collect().head
    assert(r.getDouble(0) == 0.6) // 0.1+0.2+0.3 as doubles is 0.6000000000000001
    assert(r.getDouble(1) == 0.2)
  }
}
