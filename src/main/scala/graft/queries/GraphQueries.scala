package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.ext.Graph

/** Driver registrations for the graph family (ext/Graph.scala): the
  * co-occurrence graph is parts-bought-together (lineitem keyed by
  * l_orderkey), the same shape a pretraining pipeline builds over
  * links-shared-by-documents. Every query here is exact integer
  * arithmetic end to end, so the DuckDB twins reproduce them
  * bit-for-bit — including the PageRank rounds, whose floor-division
  * update is deliberately order-independent (see Graph.pageRankScaled).
  *
  * EAGER-CONSTRUCTION contract: the triangle and PageRank entries
  * materialize their edge tables (stats-carrying local checkpoints) at
  * DataFrame-construction time — building the frame runs Spark jobs,
  * and re-executing a returned frame re-reads the frozen blocks, not
  * the source. Schema-only consumers should expect the jobs; consumers
  * needing fresh data re-call the registry function.
  */
object GraphQueries {

  private def coEdges(s: SparkSession, d: String): DataFrame =
    Graph.coOccurrenceEdges(Tables.lineitem(s, d), "l_orderkey", "l_partkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // node degrees of the undirected co-purchase graph — the join is
    // per-order fan-out (≤ C(7,2) pairs), never all-pairs
    "x_graph_degrees" -> ((s, d) => Graph.degrees(coEdges(s, d))),

    // one-row global stats; closure = Σ|N⁺(u)∩N⁺(v)| over oriented
    // edges via broadcast adjacency arrays + codegen'd two-pointer
    // intersection (r12: 8.0 s vs 43.8 s at sf1) — the wedge stream is
    // never materialized; work stays O(Σ outdeg²) ≤ O(m^1.5)
    "x_triangle_stats" -> ((s, d) => Graph.triangleStats(coEdges(s, d))),

    // sampled triangle ESTIMATOR: only md5-sampled center vertices
    // (4 of 16 buckets) contribute wedges, closure verified exactly —
    // the beyond-broadcast scale path named in SCALE.md; the DuckDB
    // twin runs the identical estimator, so even the estimate is
    // bit-stable
    "x_triangle_sample" -> ((s, d) =>
      Graph.triangleSample(coEdges(s, d), sampleBuckets = 4)),

    // 3 rounds of damped PageRank in scaled-integer arithmetic; each
    // round = one keyed shuffle + a stats-driven broadcast rank join.
    // (edges stats-checkpointed once — r16: the loop materializes deg
    // and withDeg in SEPARATE jobs, each of which re-ran the whole
    // co-occurrence self-join; the x_bfs_hops fix applied here)
    "x_pagerank" -> ((s, d) => Graph.pageRankScaled(
      org.apache.spark.sql.graft.shims.checkpointWithStats(coEdges(s, d)),
      iters = 3)),

    // warm-start refresh: 3 rounds computed, persisted via writeRanks,
    // then 2 MORE rounds resumed from the stored table — bit-identical
    // to 5 cold rounds (the oracle runs 5 unrolled rounds). This is the
    // incremental-PageRank amortization a warehouse runs: refreshes pay
    // only their incremental rounds against stored ranks.
    "x_pagerank_resumed" -> ((s, d) => {
      // stats-checkpointed once: both loop calls (3 cold + 2 resumed
      // rounds) read the same materialized edge blocks instead of each
      // re-running the co-occurrence self-join (the x_bfs_hops fix)
      val edges = org.apache.spark.sql.graft.shims.checkpointWithStats(coEdges(s, d))
      val store = graft.streaming.DrainWork.stableDir("graft_pagerank_store")
      Graph.writeRanks(Graph.pageRankScaled(edges, iters = 3), store)
      Graph.pageRankResume(edges, Graph.readRanks(s, store), iters = 2)
    }),

    // PageRank over the STORED bucketed walk table: the co-partitioned
    // edge shuffle moves to write time, rounds read hash(src) off disk
    // with zero edge-side exchanges (GraphSpec plan pin) — bit-identical
    // to the in-memory loop, so the oracle is the same unrolled rounds
    "x_pagerank_bucketed" -> ((s, d) => {
      val tmp = graft.streaming.DrainWork.stableDir("graft_walk_table")
      // edges checkpointed once (r16): writeWalkTable materializes den
      // and the bucketed table in separate jobs — each re-derived the
      // co-occurrence self-join
      Graph.writeWalkTable(
        org.apache.spark.sql.graft.shims.checkpointWithStats(coEdges(s, d)),
        "graft_walk", s"$tmp/walk", buckets = 32)
      Graph.pageRankOnWalkTable(s, "graft_walk", buckets = 32, iters = 3)
    }),

    // the weighted stored-walk twin: same layout amortization on the
    // backbone's weighted walk (src, dst, w, den=strength)
    "x_pagerank_weighted_bucketed" -> ((s, d) => {
      val tmp = graft.streaming.DrainWork.stableDir("graft_wwalk_table")
      // backbone checkpointed once — same fix as x_pagerank_bucketed
      Graph.writeWalkTableWeighted(
        org.apache.spark.sql.graft.shims.checkpointWithStats(
          weightedBackbone(s, d)), "graft_wwalk",
        s"$tmp/walk", buckets = 32)
      Graph.pageRankWeightedOnWalkTable(s, "graft_wwalk", buckets = 32, iters = 3)
    }),

    // hot-key-guarded co-occurrence: orders with > 5 distinct parts are
    // dropped before the pair fan-out (C(cap,2) bound per key) — the
    // jaccardCapped df-cap discipline on the graph family's one
    // potentially-quadratic surface
    "x_graph_cooccur_capped" -> ((s, d) =>
      Graph.coOccurrenceEdgesCapped(Tables.lineitem(s, d),
        "l_orderkey", "l_partkey", maxItemsPerKey = 5L)),

    // components of the w>=2 BACKBONE graph (thresholding sparsifies the
    // co-purchase graph from 1 giant component into real clusters);
    // pointer-jumping min-label propagation, O(log diameter) rounds
    "x_graph_components" -> ((s, d) =>
      Graph.connectedComponents(backbone(s, d))),

    // the SAME labeling maintained incrementally: cold components on the
    // (u+v)-even half of the backbone, then the odd half folded in as an
    // edge-insert delta (ext/Graph.componentsIncremental — contract old
    // components to their labels, solve the delta-touched contraction,
    // compose). Must land on the from-scratch oracle exactly.
    "x_components_incremental" -> ((s, d) => {
      // backbone checkpointed once (r16): the cold even-half solve and
      // the delta fold otherwise each re-run the co-occurrence self-join
      val edges = org.apache.spark.sql.graft.shims.checkpointWithStats(
        backbone(s, d))
      val even = edges.filter((col("u") + col("v")) % 2 === 0)
      val odd = edges.filter((col("u") + col("v")) % 2 =!= 0)
      Graph.componentsIncremental(Graph.connectedComponents(even), odd)
    }),

    // the same labeling maintained by a STREAM: backbone edges drained
    // file-by-file through componentsSink (per-batch incremental fold
    // into the standing table, StreamingIvm posture — no state store,
    // history never rescanned). Must equal from-scratch components over
    // all edges for any micro-batch split.
    "t10_streaming_components" -> ((s, d) =>
      Graph.availableNowComponents(s, backbone(s, d))),

    // weighted PageRank on the w>=2 backbone: rank splits by edge
    // weight ((rank*w) div strength), exact integers end to end
    // (backbone checkpointed once — same double-derivation fix as
    // x_pagerank)
    "x_pagerank_weighted" -> ((s, d) =>
      Graph.pageRankScaledWeighted(
        org.apache.spark.sql.graft.shims.checkpointWithStats(
          weightedBackbone(s, d)), iters = 3)),

    // 3 peeling rounds toward the 3-core of the w>=2 backbone: per
    // round, one degree agg + two semi-joins against the node-sized
    // keep set — stats-checkpointed rounds, same posture as PageRank.
    // (Fixed rounds, not fixpoint, is the oracle-checkable contract;
    // sf0.01 peels 1880 -> 1019 nodes over the 3 rounds.)
    "x_kcore" -> ((s, d) =>
      Graph.kCorePeel(backbone(s, d), k = 3, rounds = 3)),

    // multi-source BFS on the w>=2 backbone: exact hop distance from
    // the md5-bucket-'0' landmark nodes (~1/16 of nodes,
    // deterministic), capped at 3 rounds. Engine runs frontier-driven
    // rounds (O(m) total work); the oracle is the unrolled
    // propagate-everything min-merge — same function (min walk ≤ i =
    // min path ≤ i), different work bound.
    // (the backbone is stats-checkpointed ONCE: both the seed
    // derivation and the symmetrized edge list read its blocks —
    // without it the co-occurrence self-join runs twice, measured
    // 12.2 s → expected backbone-once cost at sf0.1)
    "x_bfs_hops" -> ((s, d) => {
      val bb = org.apache.spark.sql.graft.shims.checkpointWithStats(backbone(s, d))
      val seeds = Graph.degrees(bb).select(org.apache.spark.sql.functions.col("n"))
        .filter(org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("n").cast("string")), 1, 1) === "0")
      Graph.bfsHops(bb, seeds, rounds = 3)
    }),

    // weighted shortest paths on the w>=2 backbone (edge length = w),
    // 3 Bellman-Ford rounds from the same md5-'0' landmark seeds —
    // after round i, dist is exact over paths of <= i edges. Engine
    // relaxes only from nodes improved last round; oracle unrolls
    // propagate-everything (round-equivalent, Graph.ssspRounds doc).
    "x_sssp" -> ((s, d) => {
      val bb = org.apache.spark.sql.graft.shims.checkpointWithStats(
        weightedBackbone(s, d))
      val seeds = Graph.degrees(
          bb.select(org.apache.spark.sql.functions.col("u"),
            org.apache.spark.sql.functions.col("v")))
        .select(org.apache.spark.sql.functions.col("n"))
        .filter(org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("n").cast("string")), 1, 1) === "0")
      Graph.ssspRounds(bb, seeds, rounds = 3)
    }),

    // the family capstone: ONE stats-checkpointed backbone feeds
    // degree + component + weighted rank + 3-core degree, joined into
    // the per-node feature table an ML pipeline exports — the
    // x_corpus_e2e move (derive once, compute many) for graphs. Every
    // sub-feature is an already-verified operator; the e2e contract is
    // their composition off shared blocks.
    "x_graph_e2e" -> ((s, d) => {
      val wbb = org.apache.spark.sql.graft.shims.checkpointWithStats(
        weightedBackbone(s, d))
      val bb = wbb.select(org.apache.spark.sql.functions.col("u"),
        org.apache.spark.sql.functions.col("v"))
      Graph.degrees(bb)
        .join(Graph.connectedComponents(bb), "n")
        .join(Graph.pageRankScaledWeighted(wbb, iters = 3), "n")
        .join(Graph.kCorePeel(bb, k = 3, rounds = 3)
          .withColumnRenamed("deg", "core_deg"), Seq("n"), "left")
    }),

    // link-prediction score on the w>=2 BACKBONE: top-30 pairs by
    // common-neighbor count, deterministic (count desc, a, b) tie-break.
    // Backbone, not the raw graph, deliberately: the full co-purchase
    // graph's symmetric wedge volume is 143 M at sf0.1 (measured 30 s)
    // and noise-dominated — sparsify first is the production order of
    // operations, same as x_graph_components.
    "x_common_neighbors" -> ((s, d) =>
      Graph.commonNeighborsTopK(backbone(s, d), k = 30)),

    // hub-capped variant: witnesses with degree > 9 excluded (p99 of
    // the sf0.01 backbone — the cap BINDS, exercising the drop path);
    // volume becomes (cap-1)/2 · m, the linear bound — the df-cap
    // discipline closing the family's last quadratic surface
    "x_common_neighbors_capped" -> ((s, d) =>
      Graph.commonNeighborsTopKCapped(backbone(s, d), k = 30, maxCenterDeg = 9L))
  )

  /** w>=2 co-occurrence backbone (with weights) — the sparsified graph
    * the components / link-prediction / weighted-rank queries run on.
    */
  private def weightedBackbone(s: SparkSession, d: String): DataFrame =
    Graph.coOccurrenceEdgesWeighted(Tables.lineitem(s, d), "l_orderkey", "l_partkey")
      .where(org.apache.spark.sql.functions.col("w") >= 2)

  private def backbone(s: SparkSession, d: String): DataFrame =
    weightedBackbone(s, d)
      .select(org.apache.spark.sql.functions.col("u"),
        org.apache.spark.sql.functions.col("v"))

  // Shared CTE prefix: distinct (order, part) incidences → canonical
  // undirected edge list u < v (mirrors Graph.coOccurrenceEdges).
  private val edgeCte =
    """WITH inc AS (
      |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
      |pairs AS (
      |  SELECT DISTINCT a.i AS u, b.i AS v
      |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i)""".stripMargin

  /** `n` unrolled PageRank rounds over the co-occurrence graph —
    * `rank // outdeg` and `(15e6 + 85*s) // 100` are floor divisions
    * over non-negative BIGINTs in both engines, so any round count is
    * bit-identical to the Spark loop. Shared by the cold 3-round query
    * and the 3-stored + 2-resumed warm-start twin (whose contract is
    * exactly "equals 5 cold rounds").
    */
  private def pageRankRoundsSql(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""c$i AS (
         |  SELECT sym.dst, sum(r${i - 1}.rank // deg.outdeg) AS s
         |  FROM sym JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.n = sym.src
         |  GROUP BY sym.dst),
         |r$i AS (
         |  SELECT deg.src AS n,
         |    CAST((15 * 1000000 + 85 * coalesce(c$i.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM deg LEFT JOIN c$i ON c$i.dst = deg.src)""".stripMargin
    }.mkString(",\n")
    s"""$edgeCte,
       |sym AS (
       |  SELECT u AS src, v AS dst FROM pairs
       |  UNION ALL SELECT v, u FROM pairs),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM sym GROUP BY src),
       |r0 AS (SELECT src AS n, CAST(1000000 AS BIGINT) AS rank FROM deg),
       |$rounds
       |SELECT n, rank FROM r$n""".stripMargin
  }

  /** Shared by the in-memory and stored-walk weighted rank queries —
    * the stored layout must not change ranks.
    */
  private val WeightedRankSql: String = {
      def round(prev: String, cN: String, rN: String): String =
        s"""$cN AS (
           |  SELECT sym.dst, sum(($prev.rank * sym.w) // st.sw) AS s
           |  FROM sym JOIN st USING (src) JOIN $prev ON $prev.n = sym.src
           |  GROUP BY sym.dst),
           |$rN AS (
           |  SELECT st.src AS n,
           |    CAST((15 * 1000000 + 85 * coalesce($cN.s, 0)) // 100 AS BIGINT) AS rank
           |  FROM st LEFT JOIN $cN ON $cN.dst = st.src)""".stripMargin
      s"""WITH inc AS (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
         |wpairs AS (
         |  SELECT a.i AS u, b.i AS v, count(*) AS w
         |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
         |bb AS (SELECT u, v, w FROM wpairs WHERE w >= 2),
         |sym AS (
         |  SELECT u AS src, v AS dst, w FROM bb
         |  UNION ALL SELECT v, u, w FROM bb),
         |st AS (SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM sym GROUP BY src),
         |r0 AS (SELECT src AS n, CAST(1000000 AS BIGINT) AS rank FROM st),
         |${round("r0", "c1", "r1")},
         |${round("r1", "c2", "r2")},
         |${round("r2", "c3", "r3")}
         |SELECT n, rank FROM r3""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "x_graph_degrees" ->
      s"""$edgeCte,
        |nodes AS (SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
        |SELECT n, CAST(count(*) AS BIGINT) AS deg FROM nodes GROUP BY n""".stripMargin,

    "x_triangle_stats" ->
      s"""$edgeCte,
        |deg AS (
        |  SELECT n, count(*) AS deg FROM (
        |    SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
        |  GROUP BY n),
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
        |              THEN u ELSE v END AS src,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
        |              THEN v ELSE u END AS dst,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
        |              THEN d2.deg ELSE d1.deg END AS dd
        |  FROM pairs JOIN deg d1 ON d1.n = pairs.u JOIN deg d2 ON d2.n = pairs.v),
        |wedges AS (
        |  SELECT e1.dst AS v1, e2.dst AS v2
        |  FROM o e1 JOIN o e2 USING (src)
        |  WHERE e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
        |closed AS (
        |  SELECT w.v1, w.v2 FROM wedges w
        |  WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.v1 AND o.dst = w.v2))
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM deg)    AS nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM pairs)  AS edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS wedges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM closed) AS triangles""".stripMargin,

    // min-label reachability as a recursive CTE: seed (n, n), propagate
    // labels along edges, keep labels smaller than the destination (a
    // label >= the destination id can never be its component minimum, so
    // the prune is safe); UNION dedups -> guaranteed termination. The
    // engine-side pointer jumping computes the identical min-id labeling.
    "x_graph_components" ->
      """WITH RECURSIVE inc AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
        |wpairs AS (
        |  SELECT a.i AS u, b.i AS v, count(*) AS w
        |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
        |pairs AS (SELECT u, v FROM wpairs WHERE w >= 2),
        |sym AS (SELECT u AS s, v AS d FROM pairs UNION ALL SELECT v, u FROM pairs),
        |reach(n, m) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM sym)
        |  UNION
        |  SELECT sym.d, reach.m FROM reach JOIN sym ON sym.s = reach.n
        |  WHERE reach.m < sym.d)
        |SELECT n, min(m) AS component FROM reach GROUP BY n""".stripMargin,

    // streaming maintenance must be invisible in the result, same
    // contract as the batch-incremental twin below
    "t10_streaming_components" ->
      """WITH RECURSIVE inc AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
        |wpairs AS (
        |  SELECT a.i AS u, b.i AS v, count(*) AS w
        |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
        |pairs AS (SELECT u, v FROM wpairs WHERE w >= 2),
        |sym AS (SELECT u AS s, v AS d FROM pairs UNION ALL SELECT v, u FROM pairs),
        |reach(n, m) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM sym)
        |  UNION
        |  SELECT sym.d, reach.m FROM reach JOIN sym ON sym.s = reach.n
        |  WHERE reach.m < sym.d)
        |SELECT n, min(m) AS component FROM reach GROUP BY n""".stripMargin,

    // incremental maintenance must be invisible in the result: the
    // oracle is the identical from-scratch recursive CTE over ALL edges
    "x_components_incremental" ->
      """WITH RECURSIVE inc AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
        |wpairs AS (
        |  SELECT a.i AS u, b.i AS v, count(*) AS w
        |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
        |pairs AS (SELECT u, v FROM wpairs WHERE w >= 2),
        |sym AS (SELECT u AS s, v AS d FROM pairs UNION ALL SELECT v, u FROM pairs),
        |reach(n, m) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM sym)
        |  UNION
        |  SELECT sym.d, reach.m FROM reach JOIN sym ON sym.s = reach.n
        |  WHERE reach.m < sym.d)
        |SELECT n, min(m) AS component FROM reach GROUP BY n""".stripMargin,

    // symmetric wedge count over the w>=2 backbone, grouped by endpoint
    // pair; top-30 with the same (common desc, a, b) total order
    "x_common_neighbors" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
        |wpairs AS (
        |  SELECT a.i AS u, b.i AS v, count(*) AS w
        |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
        |pairs AS (SELECT u, v FROM wpairs WHERE w >= 2),
        |sym AS (
        |  SELECT u AS s, v AS d FROM pairs
        |  UNION ALL SELECT v, u FROM pairs)
        |SELECT e1.d AS a, e2.d AS b, CAST(count(*) AS BIGINT) AS common
        |FROM sym e1 JOIN sym e2 USING (s) WHERE e1.d < e2.d
        |GROUP BY 1, 2 ORDER BY common DESC, a, b LIMIT 30""".stripMargin,

    // weighted twin: strength = sum of incident weights; contribution
    // (rank*w) // strength — same unrolled 3-round shape on the backbone
    "x_pagerank_weighted" -> WeightedRankSql,

    // stored weighted walk: layout only — identical rounds by contract
    "x_pagerank_weighted_bucketed" -> WeightedRankSql,

    "x_pagerank" -> pageRankRoundsSql(3),

    // hub-cap twin: the witness filter is a HAVING prefilter on the
    // symmetric degree, everything after is the uncapped spelling
    "x_common_neighbors_capped" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
        |wpairs AS (
        |  SELECT a.i AS u, b.i AS v, count(*) AS w
        |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
        |pairs AS (SELECT u, v FROM wpairs WHERE w >= 2),
        |sym0 AS (
        |  SELECT u AS s, v AS d FROM pairs
        |  UNION ALL SELECT v, u FROM pairs),
        |ok AS (SELECT s FROM sym0 GROUP BY s HAVING count(*) <= 9),
        |sym AS (SELECT sym0.s, sym0.d FROM sym0 JOIN ok USING (s))
        |SELECT e1.d AS a, e2.d AS b, CAST(count(*) AS BIGINT) AS common
        |FROM sym e1 JOIN sym e2 USING (s) WHERE e1.d < e2.d
        |GROUP BY 1, 2 ORDER BY common DESC, a, b LIMIT 30""".stripMargin,

    // the stored layout is physical only — identical rounds by contract
    "x_pagerank_bucketed" -> pageRankRoundsSql(3),

    // unrolled simultaneous peel: keep sets are degree-HAVING filters,
    // an inner join against a GROUP BY set == the engine's semi-join
    "x_kcore" -> {
      def round(i: Int): String =
        s"""k$i AS (SELECT src FROM sym${i - 1} GROUP BY src HAVING count(*) >= 3),
           |sym$i AS (
           |  SELECT s.src, s.dst FROM sym${i - 1} s
           |  JOIN k$i a ON a.src = s.src JOIN k$i b ON b.src = s.dst)""".stripMargin
      s"""WITH inc AS (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
         |wpairs AS (
         |  SELECT a.i AS u, b.i AS v, count(*) AS w
         |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
         |pairs AS (SELECT u, v FROM wpairs WHERE w >= 2),
         |sym0 AS (
         |  SELECT u AS src, v AS dst FROM pairs
         |  UNION ALL SELECT v, u FROM pairs),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT src AS n, CAST(count(*) AS BIGINT) AS deg
         |FROM sym3 GROUP BY src""".stripMargin
    },

    // the warm-start contract IS "3 stored + 2 resumed == 5 cold rounds"
    "x_pagerank_resumed" -> pageRankRoundsSql(5),

    // composition of the four already-verified per-feature oracles off
    // one shared backbone CTE (each sym spelling renamed apart)
    "x_graph_e2e" -> {
      def wRound(prev: String, cN: String, rN: String): String =
        s"""$cN AS (
           |  SELECT wsym.dst, sum(($prev.rank * wsym.w) // st.sw) AS s
           |  FROM wsym JOIN st USING (src) JOIN $prev ON $prev.n = wsym.src
           |  GROUP BY wsym.dst),
           |$rN AS (
           |  SELECT st.src AS n,
           |    CAST((15 * 1000000 + 85 * coalesce($cN.s, 0)) // 100 AS BIGINT) AS rank
           |  FROM st LEFT JOIN $cN ON $cN.dst = st.src)""".stripMargin
      def kRound(i: Int): String =
        s"""k$i AS (SELECT src FROM ks${i - 1} GROUP BY src HAVING count(*) >= 3),
           |ks$i AS (
           |  SELECT s.src, s.dst FROM ks${i - 1} s
           |  JOIN k$i a ON a.src = s.src JOIN k$i b ON b.src = s.dst)""".stripMargin
      s"""WITH RECURSIVE inc AS (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
         |wpairs AS (
         |  SELECT a.i AS u, b.i AS v, count(*) AS w
         |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
         |bb AS (SELECT u, v, w FROM wpairs WHERE w >= 2),
         |nodes AS (SELECT u AS n FROM bb UNION ALL SELECT v FROM bb),
         |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM nodes GROUP BY n),
         |csym AS (SELECT u AS s, v AS d FROM bb UNION ALL SELECT v, u FROM bb),
         |reach(n, m) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM csym)
         |  UNION
         |  SELECT csym.d, reach.m FROM reach JOIN csym ON csym.s = reach.n
         |  WHERE reach.m < csym.d),
         |comp AS (SELECT n, min(m) AS component FROM reach GROUP BY n),
         |wsym AS (
         |  SELECT u AS src, v AS dst, w FROM bb
         |  UNION ALL SELECT v, u, w FROM bb),
         |st AS (SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM wsym GROUP BY src),
         |r0 AS (SELECT src AS n, CAST(1000000 AS BIGINT) AS rank FROM st),
         |${wRound("r0", "c1", "r1")},
         |${wRound("r1", "c2", "r2")},
         |${wRound("r2", "c3", "r3")},
         |ks0 AS (
         |  SELECT u AS src, v AS dst FROM bb
         |  UNION ALL SELECT v, u FROM bb),
         |${kRound(1)},
         |${kRound(2)},
         |${kRound(3)},
         |core AS (
         |  SELECT src AS n, CAST(count(*) AS BIGINT) AS core_deg
         |  FROM ks3 GROUP BY src)
         |SELECT deg.n, deg.deg, comp.component, r3.rank, core.core_deg
         |FROM deg JOIN comp USING (n) JOIN r3 USING (n)
         |LEFT JOIN core USING (n)""".stripMargin
    },

    // unrolled min-merge rounds: d_i(v) = min walk length <= i from the
    // seed set = min PATH length <= i — exactly what the engine's
    // frontier BFS settles by round i
    "x_bfs_hops" -> {
      def round(i: Int): String =
        s"""d$i AS (
           |  SELECT n, min(h) AS h FROM (
           |    SELECT n, h FROM d${i - 1}
           |    UNION ALL
           |    SELECT sym.dst, d${i - 1}.h + 1
           |    FROM sym JOIN d${i - 1} ON sym.src = d${i - 1}.n)
           |  GROUP BY n)""".stripMargin
      s"""WITH inc AS (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
         |wpairs AS (
         |  SELECT a.i AS u, b.i AS v, count(*) AS w
         |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
         |pairs AS (SELECT u, v FROM wpairs WHERE w >= 2),
         |sym AS (
         |  SELECT u AS src, v AS dst FROM pairs
         |  UNION ALL SELECT v, u FROM pairs),
         |d0 AS (
         |  SELECT DISTINCT src AS n, CAST(0 AS BIGINT) AS h FROM sym
         |  WHERE substring(md5(CAST(src AS VARCHAR)), 1, 1) = '0'),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT n, h AS hops FROM d3""".stripMargin
    },

    // weighted min-merge rounds: after round i, d_i(v) = min path cost
    // over <= i edges — the changed-frontier engine loop lands on the
    // same values round for round
    "x_sssp" -> {
      def round(i: Int): String =
        s"""d$i AS (
           |  SELECT n, min(h) AS h FROM (
           |    SELECT n, h FROM d${i - 1}
           |    UNION ALL
           |    SELECT sym.dst, d${i - 1}.h + sym.w
           |    FROM sym JOIN d${i - 1} ON sym.src = d${i - 1}.n)
           |  GROUP BY n)""".stripMargin
      s"""WITH inc AS (
         |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
         |wpairs AS (
         |  SELECT a.i AS u, b.i AS v, count(*) AS w
         |  FROM inc a JOIN inc b USING (k) WHERE a.i < b.i GROUP BY 1, 2),
         |bb AS (SELECT u, v, w FROM wpairs WHERE w >= 2),
         |sym AS (
         |  SELECT u AS src, v AS dst, w FROM bb
         |  UNION ALL SELECT v, u, w FROM bb),
         |d0 AS (
         |  SELECT DISTINCT src AS n, CAST(0 AS BIGINT) AS h FROM sym
         |  WHERE substring(md5(CAST(src AS VARCHAR)), 1, 1) = '0'),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT n, h AS dist FROM d3""".stripMargin
    },

    // sampled estimator twin: same md5 center-bucket filter, same exact
    // closure check against the FULL oriented edge set, same integer
    // scale-up — the estimate itself is engine-reproducible
    "x_triangle_sample" ->
      s"""$edgeCte,
        |deg AS (
        |  SELECT n, count(*) AS deg FROM (
        |    SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
        |  GROUP BY n),
        |o AS (
        |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
        |              THEN u ELSE v END AS src,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
        |              THEN v ELSE u END AS dst,
        |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
        |              THEN d2.deg ELSE d1.deg END AS dd
        |  FROM pairs JOIN deg d1 ON d1.n = pairs.u JOIN deg d2 ON d2.n = pairs.v),
        |os AS (
        |  SELECT * FROM o
        |  WHERE substring(md5(CAST(src AS VARCHAR)), 1, 1) < '4'),
        |wedges AS (
        |  SELECT e1.dst AS v1, e2.dst AS v2
        |  FROM os e1 JOIN os e2 USING (src)
        |  WHERE e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
        |closed AS (
        |  SELECT w.v1, w.v2 FROM wedges w
        |  WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.v1 AND o.dst = w.v2))
        |SELECT
        |  (SELECT CAST(count(DISTINCT src) AS BIGINT) FROM os)  AS centers_sampled,
        |  (SELECT CAST(count(*) AS BIGINT) FROM wedges)         AS wedges_sampled,
        |  (SELECT CAST(count(*) AS BIGINT) FROM closed)         AS triangles_sampled,
        |  (SELECT CAST((count(*) * 16) // 4 AS BIGINT) FROM closed) AS triangles_est""".stripMargin,

    // capped co-occurrence: the HAVING prefilter mirrors
    // coOccurrenceEdgesCapped's semi-join on bounded keys
    "x_graph_cooccur_capped" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem),
        |ok AS (SELECT k FROM inc GROUP BY k HAVING count(*) <= 5),
        |ki AS (SELECT inc.k, inc.i FROM inc JOIN ok USING (k))
        |SELECT DISTINCT a.i AS u, b.i AS v
        |FROM ki a JOIN ki b USING (k) WHERE a.i < b.i""".stripMargin
  )
}
