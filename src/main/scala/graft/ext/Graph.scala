package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph operators over edge DataFrames — the web-graph /
  * citation-graph analytics a pretraining-data pipeline runs for
  * document-quality signals (PageRank-style authority scores) and for
  * dedup-cluster diagnostics (triangle density of the near-dup
  * candidate graph).
  *
  * Everything is an equi-join on node ids — never an all-pairs product —
  * and all arithmetic is exact integers, so every operator here has a
  * bit-identical DuckDB twin and the plans scale: the only quadratic
  * surface is per-key fan-out in [[coOccurrenceEdges]], which is bounded
  * by the max group size (documented there).
  *
  * Reference analog: none (the reference has no graph stage); this is
  * builder-brief scope, same family as the dedup connected-components
  * resolution in `DedupOps.scala:328` which already does pointer-jumping
  * over exactly this edge shape.
  */
object Graph {

  /** Undirected co-occurrence edges: distinct item pairs `(u, v)` with
    * `u < v` that share at least one key (e.g. parts bought in the same
    * order, tokens in the same document). Fan-out per key is
    * C(items-per-key, 2), so the join is safe whenever group size is
    * bounded (TPC-H orders: ≤ 7 lineitems → ≤ 21 pairs; for heavy keys
    * apply a df-cap upstream like `DedupOps.jaccardCapped` does).
    */
  def coOccurrenceEdges(df: DataFrame, keyCol: String, itemCol: String): DataFrame = {
    // Deliberately the codegen'd self-join spelling, NOT
    // groupBy+collect_set+explode-combinations: the array spelling saves
    // one shuffle but its ObjectHashAggregate falls back to sort-based
    // aggregation at many groups and measures 2.5× SLOWER at 10× data
    // (51 s vs 20 s on the 12 M-edge sf1 graph) — the extra shuffle is
    // cheaper than leaving whole-stage codegen. Per-key fan-out is
    // C(items-per-key, 2), so the join is safe whenever group size is
    // bounded (TPC-H orders: ≤ 7 lineitems → ≤ 21 pairs; for heavy keys
    // apply a df-cap upstream like `DedupOps.jaccardCapped` does).
    val pairs = df.select(col(keyCol).as("k"), col(itemCol).as("i")).distinct()
    pairs.join(pairs.withColumnRenamed("i", "j"), "k")
      .where(col("i") < col("j"))
      .select(col("i").as("u"), col("j").as("v"))
      .distinct()
  }

  /** Weighted co-occurrence edges `(u, v, w)`: like
    * [[coOccurrenceEdges]] but keeping `w` = number of shared keys.
    * Thresholding on `w` is the standard way to sparsify a co-occurrence
    * graph into its meaningful backbone (pairs seen together once are
    * mostly noise; w ≥ 2 drops the sf0.01 co-purchase graph from 116 k
    * edges / 1 giant component to 3.4 k edges / 9 real clusters).
    */
  def coOccurrenceEdgesWeighted(df: DataFrame, keyCol: String,
                                itemCol: String): DataFrame = {
    val pairs = df.select(col(keyCol).as("k"), col(itemCol).as("i")).distinct()
    pairs.join(pairs.withColumnRenamed("i", "j"), "k")
      .where(col("i") < col("j"))
      .groupBy(col("i").as("u"), col("j").as("v"))
      .agg(count(lit(1)).as("w"))
  }

  /** Connected components of an undirected edge list: one row
    * `(n, component)` per node appearing in an edge, with `component` =
    * the minimum node id of its component — the same deterministic
    * labeling a recursive-CTE oracle computes. Delegates to the dedup
    * resolution's pointer-jumping min-label propagation
    * ([[DedupOps.resolveComponentsCounted]]): O(log diameter) rounds,
    * two keyed joins per round, per-round checkpoint cleanup — the graph
    * and dedup spellings of connected components are literally the same
    * operator here.
    */
  def connectedComponents(edges: DataFrame): DataFrame =
    DedupOps.resolveComponents(
        edges.select(col("u").as("doc_a"), col("v").as("doc_b")))
      .select(col("doc_id").as("n"), col("keep_id").as("component"))

  /** Top-k node pairs by COMMON NEIGHBOR count — the classic
    * link-prediction / related-items score. Deliberately the symmetric
    * spelling (both directions of every edge joined on the shared
    * center), not the degree-oriented wedge enumeration: a common
    * neighbor x of {a, b} only forms an oriented wedge at x when BOTH
    * edges orient outward from x, so the oriented count undercounts
    * pairs whose witnesses have high degree. Volume is Σ C(deg, 2); for
    * graphs with unbounded hubs, cap the neighbor lists first (same
    * df-cap discipline as `DedupOps.jaccardCapped`).
    * Ties at the k boundary break deterministically by (pairs, a, b), so
    * the selected SET is engine-independent.
    */
  def commonNeighborsTopK(edges: DataFrame, k: Int): DataFrame = {
    val sym = edges.select(col("u").as("s"), col("v").as("d"))
      .unionAll(edges.select(col("v").as("s"), col("u").as("d")))
    sym.as("e1").join(sym.as("e2"), "s")
      .where(col("e1.d") < col("e2.d"))
      .groupBy(col("e1.d").as("a"), col("e2.d").as("b"))
      .agg(count(lit(1)).as("common"))
      .orderBy(col("common").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Node degrees of an undirected edge list (`u < v` canonical). */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("n")).unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))

  /** Edges oriented from the (degree, id)-smaller endpoint to the larger
    * — the classic degree-ordering that bounds every out-neighborhood by
    * O(√m), making the wedge self-join near-linear on real (power-law)
    * graphs instead of quadratic in the max degree.
    * Output: (src, dst, dd) with dd = dst's degree (kept so wedge
    * endpoints can be ordered without re-joining degrees).
    */
  def orientByDegree(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst"),
        when(lower, col("dv")).otherwise(col("du")).as("dd"))
  }

  /** Global triangle statistics: one row of
    * (nodes, edges, wedges, triangles), all exact longs.
    *
    * Wedges are generated only at each triangle's orientation-minimal
    * vertex (out-neighbor pairs of the oriented graph), so every
    * triangle is counted exactly once and the join volume is
    * Σ C(outdeg, 2) — the degree-ordered bound, not Σ C(deg, 2).
    * The closing check is a marker equi-join (no row explosion).
    *
    * @param broadcastEdgeLimit edge count up to which the closure join
    *   broadcasts the edge side (wedges ≫ edges whenever average degree
    *   exceeds ~3, so shipping edges to the wedge stream beats shuffling
    *   the wedge stream); above it the join is a shuffled HASH join —
    *   never a sort-merge, which would sort the billions-of-rows wedge
    *   stream just to probe edge membership. Default sized for a
    *   local-driver heap (~30 M edges ≈ 700 MB hashed); on a real
    *   cluster raise it toward executor memory.
    */
  def triangleStats(edges: DataFrame,
                    broadcastEdgeLimit: Long = 30000000L): DataFrame = {
    // The four scalar branches would each re-derive their whole input
    // plan (Catalyst does not dedupe common subplans across crossJoins)
    // — with a derived edge list like coOccurrenceEdges that means
    // re-running the upstream self-join up to 6×. Checkpoint the edge
    // list and the oriented form once; every branch reads the
    // materialized blocks instead (measured 11.5 s → ~3 s at sf0.1).
    val e = edges.localCheckpoint(eager = false)
    // materializes the checkpoint; doubles as the `edges` output stat
    val eCount = e.count()
    val o = orientByDegree(e).localCheckpoint(eager = false)
    val e1 = o.select(col("src"), col("dst").as("v1"), col("dd").as("d1"))
    val e2 = o.select(col("src"), col("dst").as("v2"), col("dd").as("d2"))
    val wedges = e1.join(e2, "src")
      .where(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
      .select(col("v1"), col("v2"))
    // one wedge pass for BOTH counts: oriented edges are unique per
    // (src,dst), so the marker left-join cannot duplicate wedge rows —
    // count(*) = wedges, count(hit) = closed wedges = triangles.
    // (A left-semi for triangles would force a second full wedge join.)
    // The join strategy must be explicit: a checkpointed frame carries
    // no size stats, so AQE would default to sort-merge and pay a full
    // sort of the wedge stream (measured 21 s vs 2 s at sf0.1 / 41 M
    // wedges for broadcast).
    val edgeSide = o.select(col("src").as("v1"), col("dst").as("v2"),
      lit(1).as("hit"))
    val marked =
      if (eCount <= broadcastEdgeLimit)
        wedges.join(broadcast(edgeSide), Seq("v1", "v2"), "left")
      else
        wedges.join(edgeSide.hint("SHUFFLE_HASH"), Seq("v1", "v2"), "left")
    val wt = marked
      .agg(count(lit(1)).as("wedges"), count(col("hit")).as("triangles"))
    degrees(e).agg(count(lit(1)).as("nodes"))
      .crossJoin(wt)
      .select(col("nodes"), lit(eCount).as("edges"),
        col("wedges"), col("triangles"))
  }

  /** PageRank with damping 0.85 over the undirected edge list (both
    * directions), fixed iteration count, EXACT integer arithmetic:
    * ranks live in `scale` units (default 1e6), per-edge contribution
    * is `rank div outdeg`, and the update is
    * `(15·scale + 85·Σcontrib) div 100` — floor division end to end, so
    * the result is independent of partitioning / summation order and an
    * unrolled-CTE DuckDB twin reproduces it bit-for-bit. (Float
    * PageRank would differ across engines in the last ulp; the floor'd
    * integer form is the cross-engine-checkable spelling.)
    *
    * Each iteration is one shuffle (groupBy dst) plus a broadcast-able
    * rank join; the edge+degree table is localCheckpoint'd once so the
    * iterations don't re-derive it (same amortization pattern as the
    * stored IVF index in `Similarity.scala`). At warehouse scale ranks
    * would persist between runs (incremental PageRank); the fixed-k
    * loop here matches how quality scores are refreshed in practice.
    */
  def pageRankScaled(edges: DataFrame, iters: Int, scale: Long = 1000000L): DataFrame = {
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
    // deg is re-read every iteration (rank re-init join) — checkpoint it
    // too, or each round re-derives the whole upstream edge plan
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(eager = false)
    val withDeg = sym.join(deg, "src").localCheckpoint(eager = false)
    var ranks = deg.select(col("src").as("n"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      // rank tables are node-sized (≪ edge-sized): broadcast them so the
      // edge stream never shuffles for the joins — each round's only
      // edge-sized exchange is the groupBy(dst). (Checkpointed frames
      // carry no size stats, so AQE would fall back to sort-merge and
      // shuffle the edges 3× per round.) At node counts past driver
      // memory, pre-partition edges and ranks by the node key instead.
      val contrib = withDeg
        .join(broadcast(ranks), withDeg("src") === ranks("n"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div outdeg")).as("s"))
      ranks = deg.select(col("src").as("n"))
        .join(broadcast(contrib.withColumnRenamed("dst", "n")), Seq("n"), "left")
        .select(col("n"),
          expr(s"(15 * ${scale}L + 85 * coalesce(s, 0L)) div 100").as("rank"))
    }
    ranks
  }

  /** Weighted PageRank over `(u, v, w)` edges: identical contract to
    * [[pageRankScaled]] but rank splits proportionally to edge weight —
    * per-edge contribution is `(rank · w) div strength(src)` with
    * strength = Σ incident weights. Still exact integers end to end
    * (rank ≤ n·scale and weights are counts, so the product stays far
    * inside Long), so the unrolled DuckDB twin is bit-identical. Same
    * plan shape: node-sized strength/rank tables broadcast, one
    * groupBy(dst) per round.
    */
  def pageRankScaledWeighted(wEdges: DataFrame, iters: Int,
                             scale: Long = 1000000L): DataFrame = {
    val sym = wEdges.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionAll(wEdges.select(col("v").as("src"), col("u").as("dst"), col("w")))
    val strength = sym.groupBy("src").agg(sum(col("w")).as("sw"))
      .localCheckpoint(eager = false)
    val withS = sym.join(strength, "src").localCheckpoint(eager = false)
    var ranks = strength.select(col("src").as("n"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withS
        .join(broadcast(ranks), withS("src") === ranks("n"))
        .groupBy(col("dst"))
        .agg(sum(expr("(rank * w) div sw")).as("s"))
      ranks = strength.select(col("src").as("n"))
        .join(broadcast(contrib.withColumnRenamed("dst", "n")), Seq("n"), "left")
        .select(col("n"),
          expr(s"(15 * ${scale}L + 85 * coalesce(s, 0L)) div 100").as("rank"))
    }
    ranks
  }
}
