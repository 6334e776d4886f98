package graft

import org.apache.spark.sql.functions._

/** Measured shuffle budgets — the volume twin of PlanSpec's shape pins.
  * A plan with the right number of Exchanges can still move the whole
  * table through them; these tests assert how many BYTES/ROWS actually
  * crossed a shuffle boundary, via QueryMetrics' task-metrics listener.
  * Data quantities are deterministic (same inputs, same partitioning),
  * so thresholds are tight-ish; wall time is never asserted.
  */
class ShuffleBudgetSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("q2: the dedup shuffle carries the part-pruned slice, not all of lineitem") {
    val m = QueryMetrics.measure(
      SparkEntry.queries("q2_min_supplier")(spark, sf001))()
    // lineitem sf0.01 has ~60k rows; the 92 selected parts cover ~5%.
    // the only shuffles are the pruned distinct + tiny window/AQE reads:
    // rows crossing a shuffle must be a small fraction of the table
    assert(m.shuffleRecordsWritten > 0, "expected the dedup shuffle to exist")
    assert(m.shuffleRecordsWritten < 12000,
      s"dedup shuffle carries ${m.shuffleRecordsWritten} rows — the part " +
        "filter is no longer below the distinct")
  }

  test("j1: broadcast dims mean the fact never crosses a shuffle") {
    val m = QueryMetrics.measure(
      SparkEntry.queries("j1_enrich_left_join")(spark, sf001))()
    assert(m.shuffleRecordsWritten == 0,
      s"broadcast-join query shuffled ${m.shuffleRecordsWritten} rows")
  }

  test("q1_agg: map-side combine collapses the shuffle to group cardinality") {
    val m = QueryMetrics.measure(SparkEntry.queries("q1_agg")(spark, sf001))()
    // partial aggregation emits one row per (group × map task), far
    // below table size (60k rows; groups ≈ 6)
    assert(m.shuffleRecordsWritten > 0 && m.shuffleRecordsWritten < 600,
      s"partial agg emitted ${m.shuffleRecordsWritten} rows pre-shuffle")
  }

  test("x_triangle_stats: the wedge stream never crosses a shuffle") {
    // sf0.01: 115,729 edges generate 3.86 M oriented wedges. With the
    // broadcast closure join, shuffle traffic is EDGE-scale (derivation +
    // orientation + degree aggs — measured 119,693 records); a closure
    // regression to a shuffled join adds the full wedge stream. The 1 M
    // budget sits 8× above edge-scale and 4× below wedge-scale.
    val m = QueryMetrics.measure(
      SparkEntry.queries("x_triangle_stats")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 1000000L,
      s"triangle query shuffled ${m.shuffleRecordsWritten} records — " +
        "the wedge stream is crossing an exchange")
    assert(m.spillBytes == 0, s"spilled ${m.spillBytes} bytes at sf0.01")
  }

  test("x_pagerank: rounds shuffle partial sums, never the rank-joined edge stream") {
    // 3 rounds × broadcast rank join + groupBy(dst) with map-side
    // combine: measured 11,886 records (≈ nodes × map tasks per round).
    // If the rank joins regress to shuffling sym (231 k rows), traffic
    // jumps ~60×; budget sits 8× above measured, far below that.
    val m = QueryMetrics.measure(SparkEntry.queries("x_pagerank")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 100000L,
      s"pagerank shuffled ${m.shuffleRecordsWritten} records — rank joins " +
        "are no longer broadcast")
  }

  test("x_bfs_hops: frontier rounds shuffle node-scale sets, never the edge stream per round") {
    // backbone sf0.01 ≈ 5k edges / 1.9k nodes; frontier joins broadcast
    // the node-sized sets, so shuffle traffic is backbone-derivation +
    // per-round candidate distincts — a frontier regression to shuffled
    // edge joins multiplies traffic by edges × rounds
    // measureBuild: the graph entries run their checkpoint jobs at
    // construction time — by-value measure would see only the final scan
    val m = QueryMetrics.measureBuild(spark)(
      SparkEntry.queries("x_bfs_hops")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 400000L,
      s"bfs shuffled ${m.shuffleRecordsWritten} records")
    assert(m.spillBytes == 0)
  }

  test("x_global_rownum: one data shuffle — traffic ≈ rows, not rows × passes") {
    // 15k orders: bucket window shuffles each row once; counts/offsets
    // are bucket-sized. Budget 2× rows catches a second data shuffle.
    val m = QueryMetrics.measure(SparkEntry.queries("x_global_rownum")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 30000L,
      s"global rownum shuffled ${m.shuffleRecordsWritten} records for 15k rows")
  }

  test("x_topk_agg: partials carry ≤ k entries per (group × task), never the rows") {
    // 100k events, 5 groups, k=5: partial top-k state crossing the
    // shuffle is ≤ k × groups × map tasks (hundreds) — the window
    // spelling would shuffle all 100k rows
    val m = QueryMetrics.measure(SparkEntry.queries("x_topk_agg")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 5000L,
      s"top-k agg shuffled ${m.shuffleRecordsWritten} records — bounded " +
        "state is no longer bounding the exchange")
  }

  test("x_bm25_topk: shuffle traffic is posting-scale (query terms), not corpus-scale") {
    // the term filter lands before any shuffle: traffic = matching
    // postings + doc-length rows, far below the full token explode
    val m = QueryMetrics.measure(SparkEntry.queries("x_bm25_topk")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 60000L,
      s"bm25 shuffled ${m.shuffleRecordsWritten} records — the token " +
        "explode is crossing an exchange unfiltered")
  }

  test("x_ivm_merge: shuffle traffic is key-scale partials, never the fact rows") {
    // ~100k event rows aggregate to ~3.4k (type, hour) keys: every
    // shuffle in build+merge carries partial-agg rows (keys × map
    // tasks) — a regression that shuffles facts (base or delta) blows
    // straight through the budget. measureBuild: the entry writes its
    // base state and checkpoints delta partials at construction time.
    val m = QueryMetrics.measureBuild(spark)(
      SparkEntry.queries("x_ivm_merge")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 40000L,
      s"ivm merge shuffled ${m.shuffleRecordsWritten} records — fact " +
        "rows are crossing an exchange")
    assert(m.spillBytes == 0)
  }

  test("x_ann_pq: shuffles carry per-(vector, sub) argmin partials, never the ks fan-out") {
    // 200 vectors × 4 subs: training + encode shuffle (id, sub)-scale
    // argmin rows and (sub, code, dim)-scale update rows; the ks-way
    // distance fan-out and the codebook joins stay broadcast-side.
    // Budget sits ~6× above the measured partial volume and far below
    // a fan-out regression (× ks per stage).
    val m = QueryMetrics.measureBuild(spark)(
      SparkEntry.queries("x_ann_pq")(spark, sf001))()
    assert(m.shuffleRecordsWritten > 0)
    assert(m.shuffleRecordsWritten < 60000L,
      s"pq shuffled ${m.shuffleRecordsWritten} records")
    assert(m.spillBytes == 0)
  }

  test("x_corpus_e2e: the fused chain stays within its two-shuffle byte budget") {
    val docs = Tables.documents(spark, sf001)
    val docBytes = QueryMetrics.measure(docs)().inputBytesRead
    val m = QueryMetrics.measure(SparkEntry.queries("x_corpus_e2e")(spark, sf001))()
    // two hash shuffles over (gated, redacted) docs — shuffle volume is
    // bounded by a small multiple of the input, never a pair explosion
    assert(m.shuffleBytesWritten < 6 * docBytes,
      s"e2e chain shuffled ${m.shuffleBytesWritten} bytes for $docBytes input")
    assert(m.spillBytes == 0, s"e2e chain spilled ${m.spillBytes} bytes at sf0.01")
  }
}
