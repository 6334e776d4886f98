package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  private val old = Seq(
    (1L, Some("a"), "x"), // unchanged
    (2L, Some("b"), "x"), // value change
    (3L, Some("c"), "x"), // removed
    (4L, None, "x"),      // null -> value = changed
    (5L, None, "x")       // null -> null = unchanged
  ).toDF("k", "v1", "v2")

  private val nw = Seq(
    (1L, Some("a"), "x"),
    (2L, Some("B"), "x"),
    (4L, Some("d"), "x"),
    (5L, None, "x"),
    (6L, Some("e"), "x")  // added
  ).toDF("k", "v1", "v2")

  test("diff labels every key; nulls compare via the sentinel, not as wildcards") {
    val got = SnapshotDiff.diff(old, nw, Seq("k"), Seq("v1", "v2"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "unchanged", 6L -> "added"))
  }

  test("changes drops the unchanged bulk; summary counts per status") {
    val ch = SnapshotDiff.changes(old, nw, Seq("k"), Seq("v1", "v2"))
      .as[(Long, String)].collect().toMap
    assert(!ch.valuesIterator.contains("unchanged") && ch.size == 4)

    val sm = SnapshotDiff.summary(old, nw, Seq("k"), Seq("v1", "v2"))
      .as[(String, Long)].collect().toMap
    assert(sm == Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("digest is computed below the join: the exchange carries key + digest only") {
    val plan = SnapshotDiff.diff(old, nw, Seq("k"), Seq("v1", "v2"))
      .queryExecution.optimizedPlan.toString
    // value columns must not survive above their digest projection
    assert(!plan.linesIterator.exists(l =>
      l.contains("FullOuter") && (l.contains("v1") || l.contains("v2"))),
      s"value columns crossed the join:\n$plan")
  }

  test("empty valueCols is rejected") {
    val ex = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, nw, Seq("k"), Nil)
    }
    assert(ex.getMessage.contains("valueCols"))
  }
}
