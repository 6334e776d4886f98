package graft.queries

import graft.{SparkEntry, SparkSuite}

/** The adapted TPC-H shapes (TpchQueries): semantic smoke plus the plan
  * guards that make each shape worth having — semi/anti joins staying
  * semi/anti, dims staying broadcast, the scalar-max and correlated-avg
  * decorrelations staying collect-free. Value parity vs DuckDB is the
  * driver's oracle gate; these tests pin the *plan* shapes.
  */
class TpchQueriesSpec extends SparkSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def rows(name: String): Long =
    SparkEntry.queries(name)(spark, sfDir).count()

  test("every TpchQueries entry runs and has an oracle twin") {
    assert(TpchQueries.queries.keySet == TpchQueries.oracleSql.keySet)
    TpchQueries.queries.keys.foreach { n =>
      assert(rows(n) >= 0, s"$n failed to execute")
    }
  }

  test("q2: correlated min decorrelates to a window, dims broadcast") {
    val p = planOf("q2_min_supplier")
    assert(p.contains("Window"), "per-part min must be a window, not a self-join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q4: EXISTS compiles to a semi-join with the non-equi conjunct inside") {
    val p = planOf("q4_priority_exists")
    assert(p.contains("LeftSemi"), s"EXISTS must stay a semi-join:\n$p")
    assert(p.contains("l_shipdate") && p.contains("o_orderdate"),
      "late-line predicate must ride the join condition")
  }

  test("q13: left outer join keeps zero-order customers") {
    val df = SparkEntry.queries("q13_order_distribution")(spark, sfDir)
    // the distribution must include a 0-count bucket iff some customer
    // has no qualifying orders — at minimum the query returns rows
    assert(df.count() > 0)
    assert(planOf("q13_order_distribution").contains("LeftOuter"))
  }

  test("q15: scalar max is a 1-row broadcast, not a driver collect") {
    val p = planOf("q15_top_supplier")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"scalar-max self-selection must ride a broadcast:\n$p")
  }

  test("q19: disjunctive predicate stays one filter over one broadcast join") {
    val p = planOf("q19_disjunctive_filter")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(rows("q19_disjunctive_filter") == 1)
  }

  test("q21: EXISTS and NOT EXISTS are semi and anti joins on the fact key") {
    val p = planOf("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), s"missing semi join:\n$p")
    assert(p.contains("LeftAnti"), s"missing anti join:\n$p")
  }

  test("q22: dormancy is an anti-join; threshold is exact integer cents") {
    val p = planOf("q22_dormant_customers")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"), "scalar avg must broadcast")
  }
}
