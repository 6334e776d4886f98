package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

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
    // cheaper than leaving whole-stage codegen.
    //
    // CO-PARTITIONED derivation (r16, guide §2.4): ONE hash(k) exchange
    // up front; the (k, i)-distinct needs only clustering by a subset of
    // its keys, and the self-join needs clustering by k, so BOTH inherit
    // the layout — zero further exchanges before the pair-distinct. The
    // SHUFFLE_HASH hint pins the join away from the auto-broadcast the
    // planner would otherwise pick for a small side, because that
    // broadcast RE-COMPUTES the incidence distinct under its own
    // BroadcastExchange (plans/r16/x_graph_degrees_before.txt shows the
    // doubled subtree) and a broadcast of an incidence-scale table is
    // exactly what dies first at 100 TB. Measured (CoEdgesAbProbe,
    // sf0.1): degrees 1.74 s → 0.96 s, weighted backbone 1.60 → 0.84.
    val pairs = df.select(col(keyCol).as("k"), col(itemCol).as("i"))
      .repartition(col("k")).distinct()
    pairs.join(pairs.withColumnRenamed("i", "j").hint("SHUFFLE_HASH"), "k")
      .where(col("i") < col("j"))
      .select(col("i").as("u"), col("j").as("v"))
      .distinct()
  }

  /** [[coOccurrenceEdges]] with the hot-key guard applied INSIDE the
    * operator: keys whose distinct item count exceeds `maxItemsPerKey`
    * are dropped before the pair fan-out — the same df-cap discipline as
    * `DedupOps.jaccardCapped`, transplanted to the graph family. The
    * fan-out is then hard-bounded at C(cap, 2) rows per key, so the
    * operator stays near-linear even when a key family ISN'T
    * order-bounded (a viral link shared by 10⁶ documents would
    * otherwise alone emit 5·10¹¹ pairs).
    *
    * Semantics: pairs co-occurring ONLY under dropped hot keys
    * disappear (usually desired: membership in a huge group is weak
    * evidence of pairwise affinity — the same reasoning as capping
    * stopword shingles in Jaccard dedup). Pairs that also share a
    * bounded key are unaffected.
    */
  def coOccurrenceEdgesCapped(df: DataFrame, keyCol: String, itemCol: String,
                              maxItemsPerKey: Long): DataFrame = {
    // co-partitioned like [[coOccurrenceEdges]] — and here the layout
    // pays three more times: the fan-out count, the semi-join and the
    // pair self-join are ALL keyed by k, so the one up-front exchange
    // serves every step before the pair-distinct
    val pairs = df.select(col(keyCol).as("k"), col(itemCol).as("i"))
      .repartition(col("k")).distinct()
    // distinct (k, i) → count per k = the key's fan-out base
    val bounded = pairs.groupBy(col("k")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxItemsPerKey).select(col("k"))
    val kept = pairs.join(bounded.hint("SHUFFLE_HASH"), Seq("k"), "left_semi")
    kept.join(kept.withColumnRenamed("i", "j").hint("SHUFFLE_HASH"), "k")
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
    // co-partitioned derivation — see [[coOccurrenceEdges]]
    val pairs = df.select(col(keyCol).as("k"), col(itemCol).as("i"))
      .repartition(col("k")).distinct()
    pairs.join(pairs.withColumnRenamed("i", "j").hint("SHUFFLE_HASH"), "k")
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

  /** INCREMENTAL connected components — maintain a standing (n,
    * component) label table under edge INSERTS without recomputing from
    * scratch: `componentsIncremental(connectedComponents(E1), E2)` ≡
    * `connectedComponents(E1 ∪ E2)` row-for-row (spec- and
    * oracle-pinned).
    *
    * Why it's exact: stored labels are the MIN node id of their
    * E1-component. Contract each old component to its label
    * (super-node), add the delta's endpoints (unseen nodes label
    * themselves), and run components over the CONTRACTED graph — whose
    * node set is only the labels the delta touches. The min label of a
    * merged super-component is the min node id of the merged real
    * component, so composing the two mappings reproduces the
    * from-scratch labeling exactly.
    *
    * Scale shape (the reason to maintain rather than recompute): the
    * iterative min-propagation runs on |delta-touched labels| nodes and
    * |delta| edges — at 100 TB a daily delta touches a sliver of the
    * accumulated graph, and the standing table is read ONCE for the
    * endpoint lookup plus once for the final label remap (two keyed
    * joins, no iteration over history). The dedup-cluster use: near-dup
    * pair streams grow daily; cluster ids stay current at delta cost.
    */
  def componentsIncremental(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    // checkpoint-once discipline: the delta feeds three consumers
    // (endpoint extraction + both sides of the contraction join) and the
    // endpoint-label table feeds three more — without materialization
    // each consumer re-derives the caller's delta lineage (for a
    // co-occurrence delta that's a full self-join per reference).
    // Measured stats also let AQE broadcast the delta-sized sides, which
    // is the whole point: |delta| ≪ |standing table|.
    val delta = if (shims.planOnly) newEdges.select(col("u"), col("v"))
      else shims.checkpointWithStats(newEdges.select(col("u"), col("v")))
    // BROADCAST-SMALL FAST PATH (r9 VERDICT #5): the distributed fold
    // below has a ~3 s machinery floor per call — a second stats
    // checkpoint plus an iterative contraction solve whose per-round
    // fixed costs dominate when the delta is tiny. But the 100 TB
    // regime this operator exists for (|delta| ≪ |standing|) is exactly
    // the regime where the CONTRACTED graph fits in a broadcast: its
    // node set is delta endpoints only. So when the measured delta is
    // under the session's broadcast threshold — the same number AQE
    // would use to broadcast it — solve the contraction with a driver
    // union-find over the collected delta (the build side of a
    // broadcast hash join collects the same bytes to the driver), and
    // the whole fold becomes two standing-table scans with broadcast
    // joins: endpoint-label lookup + final remap. No second checkpoint,
    // no iterative jobs. Result is row-identical to the distributed
    // path (same contraction, same min-label algebra) — GraphSpec's
    // randomized differential and the x_components_incremental /
    // t10_streaming_components oracles pin both.
    val smallDelta = !shims.planOnly &&
      (delta.schema.fields ++ labels.schema.fields).forall(_.dataType ==
        org.apache.spark.sql.types.LongType) &&
      shims.statsSizeInBytes(delta).exists(sz => sz > 0 &&
        sz <= shims.autoBroadcastThresholdBytes(delta.sparkSession).max(1L))
    if (smallDelta) return componentsIncrementalSmall(labels, delta)
    val nodes = delta.select(col("u").as("n"))
      .unionAll(delta.select(col("v").as("n"))).distinct()
    // endpoint → current label (unseen endpoints are their own label);
    // `__new` marks endpoints absent from the standing table — they are
    // the ONLY nodes the union below may add, so the old groupBy-min
    // dedup over the whole standing table (a full-table shuffle per
    // fold) is replaced by a disjoint union: standing nodes keep their
    // stored row (lab's lookup returned the same label), new nodes
    // enter once
    val lab0 = nodes.join(labels, Seq("n"), "left")
      .select(col("n"), coalesce(col("component"), col("n")).as("lbl"),
        col("component").isNull.as("__new"))
    val lab = if (shims.planOnly) lab0 else shims.checkpointWithStats(lab0)
    val contracted = delta
      .join(lab.select(col("n").as("u"), col("lbl").as("lu")), Seq("u"))
      .join(lab.select(col("n").as("v"), col("lbl").as("lv")), Seq("v"))
      .select(col("lu").as("u"), col("lv").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val superComp = connectedComponents(contracted)
      .select(col("n").as("component"), col("component").as("__newc"))
    // connectedComponents materialized eagerly, so the delta blocks are
    // dead here (lab stays live: the result plan unions it below)
    if (!shims.planOnly) shims.unpersistLocalCheckpoint(delta)
    // all labeled nodes: the standing table plus the delta's NEW
    // endpoints (disjoint by construction — no shuffle, no dedupe)
    val all = labels.unionByName(
      lab.filter(col("__new")).select(col("n"), col("lbl").as("component")))
    // labels untouched by the delta miss in superComp and keep themselves
    all.join(superComp, Seq("component"), "left")
      .select(col("n"), coalesce(col("__newc"), col("component")).as("component"))
  }

  /** [[componentsIncremental]]'s driver-solved fast path for broadcast-
    * small deltas; `delta` is already stats-checkpointed with (u, v)
    * BIGINT columns. Collects the delta (bounded by the broadcast
    * threshold), looks up the endpoints' standing labels with ONE
    * broadcast-join scan, runs a min-tracking union-find over the
    * contracted label graph on the driver, and remaps the standing
    * table with the (old → new) label map as a LocalRelation broadcast
    * join — the standing table is still read exactly twice and never
    * shuffled or iterated.
    */
  private def componentsIncrementalSmall(labels: DataFrame,
                                         delta: DataFrame): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val edges = delta.collect().map(r => (r.getLong(0), r.getLong(1)))
    shims.unpersistLocalCheckpoint(delta)
    val nodeIds = {
      val b = Array.newBuilder[Long]
      edges.foreach { case (u, v) => b += u; b += v }
      b.result().distinct
    }
    // one standing-table scan: which delta endpoints already have labels
    // (the LocalRelation side carries exact stats → broadcast hash join)
    val found = new java.util.HashMap[Long, Long]()
    if (nodeIds.nonEmpty)
      labels.join(nodeIds.toSeq.toDF("n"), Seq("n"), "left_semi")
        .collect().foreach(r =>
          found.put(r.getAs[Long]("n"), r.getAs[Long]("component")))
    def lbl(n: Long): Long = found.getOrDefault(n, n)
    // min-tracking union-find over the label space: the merged super-
    // component's label is the min of its member labels, which (labels
    // being min node ids of their old components, new nodes labeling
    // themselves) is the min node id of the merged real component —
    // the same algebra the distributed contraction solve computes
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x
      while (parent.getOrDefault(c, c) != c) { val nx = parent.get(c); parent.put(c, r); c = nx }
      r
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(lbl(u)), find(lbl(v)))
      if (ru != rv) { if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv) }
    }
    // roots are min-by-construction (always union larger label under
    // smaller), so find(L) IS the new label of L's super-component
    val touched = nodeIds.map(lbl).distinct
    val superPairs = touched.flatMap { l =>
      val nl = find(l); if (nl != l) Some((l, nl)) else None
    }
    val newNodes = nodeIds.filterNot(found.containsKey)
      .map(n => (n, find(lbl(n))))
    val remapped =
      if (superPairs.isEmpty) labels
      else labels.join(superPairs.toSeq.toDF("component", "__newc"),
          Seq("component"), "left")
        .select(col("n"),
          coalesce(col("__newc"), col("component")).as("component"))
    if (newNodes.isEmpty) remapped
    else remapped.unionByName(newNodes.toSeq.toDF("n", "component"))
  }

  /** foreachBatch sink maintaining a STANDING component-label table
    * under a streaming edge feed — each micro-batch of edge inserts
    * folds into the stored labeling via [[componentsIncremental]] (the
    * StreamingIvm posture applied to graph state: the table IS the
    * state, no state store, the edge history is never rescanned).
    * Because the incremental fold is exact for ANY insert sequence
    * (GraphSpec's randomized-split differential), the maintained table
    * equals from-scratch components over all edges regardless of how
    * the source splits into micro-batches — so the drained result is
    * oracle-checkable against the same recursive-CTE twin as the batch
    * operator. Replay is guarded by the lineage-scoped batchId marker
    * (idempotent anyway — re-inserting edges cannot change a labeling —
    * but the guard skips the merge job itself, same as the other sinks).
    *
    * The dedup use at 100 TB: near-dup PAIR streams grow daily; cluster
    * ids stay current at per-delta cost, with the standing table read
    * twice per batch (endpoint lookup + final remap), never iterated.
    */
  def componentsSink(outPath: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val target = new org.apache.hadoop.fs.Path(outPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.streaming.AtomicSwap.heal(fs, target)
    val lineage = graft.streaming.AtomicSwap.streamLineage(spark)
    if (graft.streaming.AtomicSwap.alreadyApplied(fs, target, batchId, lineage)) return
    // declared schema: the standing read runs every batch, and
    // footer-based inference is a per-batch job the fold doesn't need
    val standing =
      if (fs.exists(target))
        spark.read.schema("n BIGINT, component BIGINT").parquet(outPath)
      else spark.range(0).select(col("id").as("n"), col("id").as("component"))
    val merged0 = componentsIncremental(standing, batch)
    // the merge reads the path it is about to replace — materialize
    // before the swap (same reason the ivm/sketch sinks checkpoint)
    val merged = merged0.localCheckpoint(true)
    graft.streaming.AtomicSwap.commit(merged, outPath, batchId, lineage)
    // mart is on disk: free this batch's blocks — the internal `lab` /
    // loop checkpoints still referenced by merged0's plan, then the
    // swap copy itself
    shims.unpersistLocalCheckpoint(merged0)
    shims.unpersistLocalCheckpoint(merged)
  }

  /** Drain an edge table through [[componentsSink]]
    * (`Trigger.AvailableNow`, one file per micro-batch) and return the
    * MAINTAINED label table — must equal [[connectedComponents]] over
    * all edges for any file split. `edges` is materialized to a temp
    * parquet dir first so the stream has a file source; `filesPerBatch`
    * controls how many incremental folds the drain exercises.
    */
  def availableNowComponents(spark: SparkSession, edges: DataFrame,
                             filesPerBatch: Int = 1): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val work = graft.streaming.DrainWork.tempDir("graft_stream_cc")
    val src = s"$work/edges"
    val mart = s"$work/labels"
    // 3 files → cold solve + 2 incremental folds at filesPerBatch=1:
    // enough splits to exercise merge/bridge/new-node paths. NOTE a
    // random split is the WORST case for the incremental fold — each
    // third of a co-occurrence graph touches most nodes, so every
    // fold's contraction is near-graph-sized; the |delta| ≪ |standing|
    // case the operator exists for (daily pair-stream growth) is
    // exercised by GraphSpec and priced in SCALE.md instead
    edges.repartition(3).write.parquet(src)
    // schema = the just-written frame's, top-level-nullable like a
    // parquet read-back — no re-inference (guide §6 metadata cost)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        edges.schema.fields.map(_.copy(nullable = true))))
      .option("maxFilesPerTrigger", filesPerBatch)
      .parquet(src)
    graft.streaming.DrainWidth.clamped(spark) {
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/checkpoint")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(componentsSink(mart) _)
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(mart)
  }

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

  /** Hub-capped link prediction: identical to [[commonNeighborsTopK]]
    * except nodes with degree above `maxCenterDeg` contribute NO wedges
    * as the shared-neighbor WITNESS — the volume bound drops from
    * Σ C(deg, 2) to Σ_{deg≤cap} C(deg, 2) ≤ (cap−1)/2 · m, linear in
    * edges. Same reasoning as the shingle df-cap and
    * [[coOccurrenceEdgesCapped]]: membership in a huge neighborhood is
    * weak pairwise evidence, so hubs are dropped as witnesses (they
    * still appear as ENDPOINTS via their bounded-degree neighbors).
    * This closes the graph family's last documented quadratic surface.
    */
  def commonNeighborsTopKCapped(edges: DataFrame, k: Int,
      maxCenterDeg: Long): DataFrame = {
    val ok = degrees(edges).filter(col("deg") <= maxCenterDeg)
      .select(col("n").as("s"))
    val sym = edges.select(col("u").as("s"), col("v").as("d"))
      .unionAll(edges.select(col("v").as("s"), col("u").as("d")))
      .join(ok, Seq("s"), "left_semi")
    sym.as("e1").join(sym.as("e2"), "s")
      .where(col("e1.d") < col("e2.d"))
      .groupBy(col("e1.d").as("a"), col("e2.d").as("b"))
      .agg(count(lit(1)).as("common"))
      .orderBy(col("common").desc, col("a"), col("b"))
      .limit(k)
  }

  /** `rounds` simultaneous peeling rounds toward the k-core: each round
    * drops every node whose CURRENT degree is below `k` (both endpoints
    * must survive for an edge to survive), then recomputes degrees on
    * what's left. Full k-core = peel to fixpoint; the fixed-round form
    * is the oracle-checkable contract (an unrolled-CTE twin reproduces
    * it bit for bit), and at fixpoint the two coincide. Returns the
    * surviving nodes with their degree in the peeled graph.
    *
    * Scale shape, per round: one map-side-combined degree aggregation +
    * two semi-joins of the edge stream against the node-sized keep set.
    * Rounds materialize through stats-carrying checkpoints (the
    * PageRank pattern): lineage stays round-sized instead of growing
    * 3× per round (the symmetrized list has three consumers), and the
    * keep side auto-broadcasts from measured stats — no hints. Prior
    * rounds' blocks are freed as soon as the next round materializes.
    */
  /** Broadcast-small bound for the fixed-round driver solves (r16 —
    * the [[DedupOps.resolveComponentsCounted]] cold-solve move applied
    * to the peel/BFS/SSSP family): -1 = the session's auto-broadcast
    * threshold, 0 disables (GraphSpec's early-exit job pins force the
    * distributed loop with it), >0 = explicit bytes.
    */
  private def smallGraphLimit(df: DataFrame, smallSolveBytes: Long): Long =
    if (smallSolveBytes == 0L) 0L
    else if (smallSolveBytes > 0L) smallSolveBytes
    else shims.autoBroadcastThresholdBytes(df.sparkSession).max(0L)

  /** Whether a stats-checkpointed all-BIGINT frame fits the driver-solve
    * bound — the same measured footprint AQE would broadcast on.
    */
  private def fitsSmall(ck: DataFrame, limit: Long): Boolean =
    !shims.planOnly && limit > 0L &&
      ck.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.LongType) &&
      shims.statsSizeInBytes(ck).exists(sz => sz > 0 && sz <= limit)

  def kCorePeel(edges: DataFrame, k: Int, rounds: Int,
                smallSolveBytes: Long = -1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var sym = shims.checkpointWithStats(
      edges.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(edges.select(col("v").as("src"), col("u").as("dst"))))
    // BROADCAST-SMALL DRIVER PEEL (r16): same fixed-round algebra on the
    // collected edge list — per round, degrees per src, then an edge
    // survives iff BOTH endpoints keep degree ≥ k; early exit when a
    // round drops nothing (the loop's strict-shrink check). Identical
    // rows to the distributed rounds (GraphSpec differential).
    if (fitsSmall(sym, smallGraphLimit(sym, smallSolveBytes))) {
      val spark = edges.sparkSession
      import spark.implicits._
      var cur = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
      shims.unpersistLocalCheckpoint(sym)
      var i = 1
      var shrinking = true
      while (i <= rounds && shrinking) {
        val deg = new java.util.HashMap[Long, Long]()
        cur.foreach { case (s, _) => deg.merge(s, 1L, (a, b) => a + b) }
        val pruned = cur.filter { case (s, d) =>
          deg.getOrDefault(s, 0L) >= k && deg.getOrDefault(d, 0L) >= k }
        shrinking = pruned.length < cur.length
        cur = pruned
        i += 1
      }
      val outDeg = new java.util.LinkedHashMap[Long, Long]()
      cur.foreach { case (s, _) => outDeg.merge(s, 1L, (a, b) => a + b) }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](outDeg.size)
      outDeg.forEach((n, d) => out += ((n, d)))
      return out.toSeq.toDF("n", "deg")
    }
    var prev = sym
    var i = 1
    var shrinking = true
    // EARLY EXIT: when a round drops no edges the peel is at fixpoint
    // and every further round is a no-op re-aggregation — free check
    // from the per-round checkpoint's injected row count. Result
    // unchanged (the fixed-round oracle unrolls identical rounds).
    while (i <= rounds && shrinking) {
      val keep = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      val pruned = sym
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
      sym = shims.checkpointWithStats(pruned)
      shrinking = (for (a <- shims.statsRowCount(sym);
                        b <- shims.statsRowCount(prev)) yield a < b).getOrElse(true)
      shims.unpersistLocalCheckpoint(prev)
      prev = sym
      i += 1
    }
    // the final checkpoint stays live: the returned frame reads its blocks
    sym.groupBy(col("src").as("n")).agg(count(lit(1)).as("deg"))
  }

  /** Multi-source BFS: exact hop distance from a seed set, capped at
    * `rounds` — landmark distances, the classic graph feature for
    * related-item ranking and curriculum "distance from trusted seeds"
    * scoring. Returns `(n, hops)` for every node within `rounds` hops
    * of a seed (seeds themselves at 0); unreached nodes are absent.
    *
    * Frontier-driven: round `i` joins the edge stream against ONLY the
    * nodes settled in round `i−1` (not the whole settled set), so the
    * per-round volume is the frontier's incident edges — the textbook
    * BFS work bound Σ|frontier edges| = O(m) TOTAL across all rounds,
    * vs O(m·rounds) for the propagate-everything spelling. The oracle
    * twin IS the propagate-everything min-merge (min walk length ≤ i =
    * min path length ≤ i, so the two compute the same function); the
    * engine runs the frontier form because at 100 TB the difference is
    * `rounds×` the edge stream.
    *
    * Scale shape, per round: one edge-scan joined to the node-bounded
    * frontier (auto-broadcast from checkpoint stats), one distinct on
    * the candidate set, one anti-join against the node-bounded settled
    * set. Rounds materialize through stats-carrying checkpoints and
    * free the previous round's blocks — the kCorePeel lifetime pattern.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, rounds: Int,
              smallSolveBytes: Long = -1L): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    var settled = shims.checkpointWithStats(
      seeds.select(col("n")).distinct().select(col("n"), lit(0L).as("hops")))
    if (rounds == 0) return settled // no traversal: skip the edge pass
    val sym = shims.checkpointWithStats(
      edges.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(edges.select(col("v").as("src"), col("u").as("dst"))))
    // BROADCAST-SMALL DRIVER BFS (r16): identical frontier semantics on
    // the collected edge list — round i settles exactly the unsettled
    // neighbors of round i−1's frontier; early exit on an empty
    // frontier. Row-identical to the distributed rounds (GraphSpec
    // differential).
    if (fitsSmall(sym, smallGraphLimit(sym, smallSolveBytes)) &&
        settled.schema("n").dataType == org.apache.spark.sql.types.LongType) {
      val spark = edges.sparkSession
      import spark.implicits._
      val edgesArr = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
      val dist = new java.util.LinkedHashMap[Long, Long]()
      settled.collect().foreach(r => dist.put(r.getLong(0), 0L))
      shims.unpersistLocalCheckpoint(sym)
      shims.unpersistLocalCheckpoint(settled)
      var frontier: Set[Long] = {
        val b = Set.newBuilder[Long]
        dist.forEach((n, _) => b += n)
        b.result()
      }
      var i = 1
      while (i <= rounds && frontier.nonEmpty) {
        val next = Set.newBuilder[Long]
        edgesArr.foreach { case (s, d) =>
          if (frontier.contains(s) && !dist.containsKey(d)) next += d
        }
        val nx = next.result()
        nx.foreach(n => dist.put(n, i.toLong))
        frontier = nx
        i += 1
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](dist.size)
      dist.forEach((n, h) => out += ((n, h)))
      return out.toSeq.toDF("n", "hops")
    }
    var prev = settled
    var i = 1
    var grew = true
    // EARLY EXIT: the checkpoint stats make "did the settled set grow"
    // a free check — once a round adds nothing the frontier is empty
    // and every further round would re-run the round machinery to add
    // nothing (at diameter ≪ rounds that's pure waste). Oracle
    // contract unaffected: an empty frontier contributes no rows.
    while (i <= rounds && grew) {
      val frontier = settled.filter(col("hops") === (i - 1).toLong)
        .select(col("n").as("src"))
      val next = sym.join(frontier, Seq("src"))
        .select(col("dst").as("n")).distinct()
        .join(settled, Seq("n"), "left_anti")
        .select(col("n"), lit(i.toLong).as("hops"))
      settled = shims.checkpointWithStats(settled.unionAll(next))
      grew = (for (a <- shims.statsRowCount(settled);
                   b <- shims.statsRowCount(prev)) yield a > b).getOrElse(true)
      shims.unpersistLocalCheckpoint(prev)
      prev = settled
      i += 1
    }
    // sym is dead at return (the result reads only settled's blocks);
    // without this the edge-sized blocks leak per invocation (r7 ADVICE)
    shims.unpersistLocalCheckpoint(sym)
    settled
  }

  /** Weighted multi-source shortest paths, `rounds` Bellman-Ford
    * relaxations over `(u, v, w)` edges (w = non-negative integer edge
    * length; map similarity to cost upstream if "strong tie = short
    * distance" is wanted). Returns `(n, dist)` for nodes reachable
    * within `rounds` EDGES of a seed — after round i, dist(v) is the
    * exact minimum cost over paths of ≤ i edges, so at rounds ≥
    * graph diameter it is the true shortest-path distance. The
    * weighted sibling of [[bfsHops]] (which this generalizes: unit
    * weights reduce to hop counts — pinned in GraphSpec).
    *
    * Changed-frontier relaxation: round i propagates only from nodes
    * whose distance IMPROVED in round i−1 (a node whose distance is
    * unchanged re-offers exactly the offers already merged — the
    * classic Bellman-Ford queue optimization, round-equivalent to
    * propagate-everything, which is what the unrolled oracle runs).
    * Distances are exact integer sums — no float path costs — so the
    * engine and the unrolled-CTE twin agree bit for bit.
    *
    * Scale shape, per round: one edge-scan joined to the node-bounded
    * changed set (auto-broadcast from checkpoint stats), one min-agg
    * on candidates, one min-merge + improvement filter against the
    * node-bounded distance table. kCorePeel checkpoint lifetimes.
    */
  def ssspRounds(edges: DataFrame, seeds: DataFrame, rounds: Int,
                 smallSolveBytes: Long = -1L): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    var dist = shims.checkpointWithStats(
      seeds.select(col("n")).distinct().select(col("n"), lit(0L).as("dist")))
    if (rounds == 0) return dist // no relaxation: skip the edge pass
    val sym = shims.checkpointWithStats(
      edges.select(col("u").as("src"), col("v").as("dst"), col("w"))
        .unionAll(edges.select(col("v").as("src"), col("u").as("dst"), col("w"))))
    // BROADCAST-SMALL DRIVER RELAXATION (r16): identical changed-frontier
    // Bellman-Ford on the collected edge list — round i offers
    // d(src)+w from nodes improved in round i−1, merges by min, keeps
    // strict improvements; early exit when nothing improves. Exact
    // integers, row-identical to the distributed rounds (GraphSpec
    // differential).
    if (fitsSmall(sym, smallGraphLimit(sym, smallSolveBytes)) &&
        dist.schema("n").dataType == org.apache.spark.sql.types.LongType) {
      val spark = edges.sparkSession
      import spark.implicits._
      val edgesArr = sym.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val d = new java.util.LinkedHashMap[Long, Long]()
      dist.collect().foreach(r => d.put(r.getLong(0), 0L))
      shims.unpersistLocalCheckpoint(sym)
      shims.unpersistLocalCheckpoint(dist)
      var changed: Set[Long] = {
        val b = Set.newBuilder[Long]
        d.forEach((n, _) => b += n)
        b.result()
      }
      var i = 1
      while (i <= rounds && changed.nonEmpty) {
        val cand = new java.util.HashMap[Long, Long]()
        edgesArr.foreach { case (s, t, w) =>
          if (changed.contains(s))
            cand.merge(t, d.get(s) + w, (a, b) => math.min(a, b))
        }
        val improvedB = Set.newBuilder[Long]
        cand.forEach { (n, v) =>
          if (!d.containsKey(n) || v < d.get(n)) { d.put(n, v); improvedB += n }
        }
        changed = improvedB.result()
        i += 1
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](d.size)
      d.forEach((n, v) => out += ((n, v)))
      return out.toSeq.toDF("n", "dist")
    }
    var changed = dist // round 0: every seed just "improved" to 0
    var i = 1
    var live = true
    // EARLY EXIT: once no distance improves, every later round relaxes
    // an empty changed set — fixpoint reached (free check from the
    // improvement checkpoint's injected row count). Oracle contract
    // unaffected: an empty changed set offers nothing to merge.
    while (i <= rounds && live) {
      val cand = sym
        .join(changed.select(col("n").as("src"), col("dist").as("d0")), Seq("src"))
        .select(col("dst").as("n"), (col("d0") + col("w")).as("dist"))
        .groupBy(col("n")).agg(min(col("dist")).as("dist"))
      val merged = shims.checkpointWithStats(
        dist.unionAll(cand).groupBy(col("n")).agg(min(col("dist")).as("dist")))
      // improvement filter reads the OLD dist — materialize before the
      // old round's blocks are freed
      val improved = shims.checkpointWithStats(
        merged.join(dist.withColumnRenamed("dist", "prev"), Seq("n"), "left")
          .filter(col("prev").isNull || col("dist") < col("prev"))
          .select(col("n"), col("dist")))
      if (changed ne dist) shims.unpersistLocalCheckpoint(changed)
      shims.unpersistLocalCheckpoint(dist)
      dist = merged
      changed = improved
      live = shims.statsRowCount(improved).forall(_ > 0L)
      i += 1
    }
    // the final round's improvement set is not part of the result's
    // lineage (dist reads its own merged blocks) — free it; sym is
    // likewise dead at return (r7 ADVICE: it leaked per invocation)
    if (changed ne dist) shims.unpersistLocalCheckpoint(changed)
    shims.unpersistLocalCheckpoint(sym)
    dist
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
    * PRECONDITION (both strategies, r12 ADVICE): `edges` must be a
    * DISTINCT undirected edge list — one row per unordered pair, no
    * self-loops. Duplicates break both branches differently (the
    * adjacency arrays double-list a neighbor and inflate the
    * Σ(outdeg−1) wedge term while `sorted_intersect_count` keeps set
    * semantics; the wedge self-join fans out), so the two strategies
    * would also disagree across `broadcastEdgeLimit`. The repo's edge
    * producers ([[coOccurrenceEdges]] and kin) emit distinct pairs by
    * construction; a caller with raw edges must `.distinct()` first —
    * not done defensively here because it is an edge-scale shuffle the
    * common (already-distinct) case would pay on every call.
    *
    * Two closure strategies, picked by measured edge count (r12):
    *
    * UNDER `broadcastEdgeLimit` — adjacency intersection: per-src
    * sorted out-neighbor arrays are built once (one edge-scale
    * shuffle), broadcast, and the triangle count is
    * Σ_{(u,v)∈oriented} |N⁺(u) ∩ N⁺(v)| — one pass over the EDGE rows
    * with two broadcast lookups and a codegen'd two-pointer merge of
    * two tiny sorted arrays per row ([[graft.functions.SortedIntersectCount]]).
    * The wedge stream is never materialized even inside codegen: the
    * wedge COUNT falls out of Σ (outdeg−1) div 2 over the same pass.
    * vs the wedge-enumeration spelling this replaces, each wedge costs
    * a sequential compare of two cache-resident arrays instead of a
    * random probe into an edge-count-sized broadcast hash (a cache
    * miss per wedge at 12 M edges): measured 18.0 s vs 54.6 s at sf1
    * (411 M wedges) and 2.3 s vs 4.3 s at sf0.1, identical outputs
    * (TriAdjProbe). Each triangle is counted exactly once BECAUSE THE
    * ORIENTATION IS A TOTAL ORDER: for triangle a≺b≺c (oriented edges
    * a→b, a→c, b→c), only edge (a,b) finds c in both out-lists —
    * edge (a,c) would need b∈N⁺(c), i.e. an edge c→b, which the
    * orientation forbids, and likewise (b,c) would need a∈N⁺(b). The
    * arrays' sort order (plain node id) is irrelevant to uniqueness;
    * it exists solely so the two-pointer merge works.
    *
    * OVER the limit — wedge enumeration with a SHUFFLE_HASH closure
    * join (never sort-merge, which would sort the billions-of-rows
    * wedge stream just to probe edge membership): the adjacency maps,
    * like the edge hash, outgrow executor memory past ~30 M edges
    * (~700 MB hashed — the measured sf10 OOM cliff), and the shuffled
    * wedge pipeline is the spelling that survives 100+ M-edge graphs.
    *
    * @param broadcastEdgeLimit edge count up to which the closure
    *   broadcasts (adjacency arrays under it, never built over it).
    *   Default sized for a local-driver heap; on a real cluster raise
    *   it toward executor memory.
    */
  def triangleStats(edges: DataFrame,
                    broadcastEdgeLimit: Long = 30000000L): DataFrame = {
    // EAGER: the checkpoint materializes the edge list at
    // DataFrame-CONSTRUCTION time (documented at the registry entry).
    // The four scalar branches would each re-derive their whole input
    // plan (Catalyst does not dedupe common subplans across crossJoins)
    // — with a derived edge list like coOccurrenceEdges that means
    // re-running the upstream self-join up to 6×; checkpointing the
    // edge list and the oriented form once cut the r5 build from
    // 11.5 s to ~4 s at sf0.1. Deliberately the LAZY checkpoint +
    // count spelling, NOT checkpointWithStats: every join strategy in
    // this operator is explicit (the threshold below), so injected
    // stats decide nothing here — and this frame is referenced FIVE
    // times in one plan (2 degree-agg scans + the orient joins), where
    // the r7 layout-preserving stats checkpoint defeated AQE exchange
    // dedup across the cloned references and ran the degree stages
    // twice: the named r7 bench regression (4.2 s → 7.2 s at sf0.1;
    // see checkpointWithStatsLayout's scaladoc and SCALE.md round 8).
    val e = shims.lazyCheckpoint(edges)
    // the count is the action that materializes the checkpoint blocks
    // (one pass); its value drives ONLY the broadcast-vs-shuffle
    // decision and the `edges` output literal
    val eCount = if (shims.planOnly) 0L else e.count()
    // o stays a LAZY checkpoint: its first consumer materializes it in
    // the same pass (an eager stats checkpoint costs an extra edge-sized
    // pass + cache write, measured 1.3× on the whole query at sf0.1),
    // and the closure strategy below is explicit anyway — o's stats
    // would decide nothing
    val o = shims.lazyCheckpoint(orientByDegree(e))
    // The strategy threshold stays EXPLICIT even though the checkpoint
    // now carries real stats: the generic broadcast threshold (10 MB)
    // is sized for "build side is cheap to ship", but here the
    // alternative is a wedge stream that outweighs the edge side ~30×
    // — only this operator knows that ratio.
    val wt =
      if (eCount <= broadcastEdgeLimit) {
        // lazy-checkpointed because TWO broadcasts consume it (src- and
        // dst-keyed): their canonical plans differ by the rename
        // Project, so ReuseExchange can't dedupe them — without the
        // checkpoint the edge-scale groupBy + per-src array sort runs
        // twice per query (r12 review finding)
        val adj = shims.lazyCheckpoint(o.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("ns")))
        val adjDst = adj.select(col("src").as("dst"), col("ns").as("ns2"))
        // left join: a sink dst has no out-list (closes nothing); the
        // coalesce below covers the empty-graph agg (sum over 0 rows)
        o.join(broadcast(adj), Seq("src"))
          .join(broadcast(adjDst), Seq("dst"), "left")
          .agg(
            expr("sum(size(ns) - 1) div 2").as("w"),
            sum(when(col("ns2").isNull, 0L).otherwise(
              graft.functions.SortedIntersectCount.sortedIntersectCount(
                col("ns"), col("ns2")))).as("t"))
          .select(coalesce(col("w"), lit(0L)).as("wedges"),
            coalesce(col("t"), lit(0L)).as("triangles"))
      } else {
        // wedge enumeration: one pass for BOTH counts — oriented edges
        // are unique per (src,dst), so the marker left-join cannot
        // duplicate wedge rows (count(*) = wedges, count(hit) =
        // triangles). SHUFFLE_HASH, never sort-merge: a wedge-stream
        // sort measured 21 s vs 2 s at sf0.1 / 41 M wedges.
        val e1 = o.select(col("src"), col("dst").as("v1"), col("dd").as("d1"))
        val e2 = o.select(col("src"), col("dst").as("v2"), col("dd").as("d2"))
        val wedges = e1.join(e2, "src")
          .where(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("v1") < col("v2")))
          .select(col("v1"), col("v2"))
        val edgeSide = o.select(col("src").as("v1"), col("dst").as("v2"),
          lit(1).as("hit"))
        wedges.join(edgeSide.hint("SHUFFLE_HASH"), Seq("v1", "v2"), "left")
          .agg(count(lit(1)).as("wedges"), count(col("hit")).as("triangles"))
      }
    // `edges` is the checkpoint's exact row count as a literal — an agg
    // branch over the cached blocks measures ~1 s/rep for the same
    // number, and the count can't go stale: the checkpoint froze the
    // edge data this plan reads (eager contract, documented at the
    // registry entry)
    degrees(e).agg(count(lit(1)).as("nodes"))
      .crossJoin(wt)
      .select(col("nodes"), lit(eCount).as("edges"),
        col("wedges"), col("triangles"))
  }

  /** Sampled triangle ESTIMATOR for graphs whose wedge volume is past
    * enumerable scale (SCALE.md names this the path beyond ~4 B wedges,
    * where even the oriented wedge stream dominates the job).
    *
    * Sampling is at the wedge-generating CENTER vertex, before any
    * enumeration: only centers whose md5 bucket falls below
    * `sampleBuckets` (of 16) contribute their out-wedges, so the
    * closure work drops by sampleBuckets/16 BEFORE the adjacency pass
    * (or, over the broadcast limit, the wedge self-join) —
    * sample-don't-enumerate, the same move as the banded `x_lsh_recall`
    * truth set. Every wedge (and so every triangle) belongs to exactly
    * one center in the degree orientation, making
    * `closed · 16 div sampleBuckets` an unbiased triangle estimate;
    * closure of sampled wedges is verified EXACTLY against the full
    * edge side. md5 of the decimal node id renders identically in
    * Spark and DuckDB, so the estimator (not just the expectation) is
    * engine-reproducible bit for bit.
    *
    * Returns one row:
    * (centers_sampled, wedges_sampled, triangles_sampled, triangles_est).
    *
    * Same PRECONDITION as [[triangleStats]]: `edges` must be a distinct
    * undirected edge list (no duplicate pairs, no self-loops).
    */
  def triangleSample(edges: DataFrame, sampleBuckets: Int = 4,
                     broadcastEdgeLimit: Long = 30000000L): DataFrame = {
    require(sampleBuckets >= 1 && sampleBuckets <= 16,
      s"sampleBuckets must be in [1,16], got $sampleBuckets")
    // single-hex-digit LEXICAL bound: 'g' sorts above every hex digit,
    // so 16 buckets means "keep all"
    val bucketBound =
      if (sampleBuckets == 16) "g"
      else java.lang.Long.toHexString(sampleBuckets.toLong)
    // lazy + count, same reasoning as triangleStats: strategies are
    // explicit, the frame is multi-referenced
    val e = shims.lazyCheckpoint(edges)
    val eCount = if (shims.planOnly) 0L else e.count()
    val o = shims.lazyCheckpoint(orientByDegree(e))
    // the center filter lands on the checkpointed scan BEFORE any
    // enumeration — sampling a center keeps its WHOLE out-list (the
    // filter is on src), so N⁺(u) is exact for every sampled u
    val oS = o.filter(
      substring(md5(col("src").cast("string")), 1, 1) < lit(bucketBound))
    val wt =
      if (eCount <= broadcastEdgeLimit) {
        // adjacency intersection, same strategy (and same exact
        // counts) as triangleStats: src-side arrays from the SAMPLED
        // edges (complete for sampled centers), dst-side from the FULL
        // graph — closure of sampled wedges is verified exactly
        val adjS = oS.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("ns"))
        val adjDst = o.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("ns2"))
          .withColumnRenamed("src", "dst")
        oS.join(broadcast(adjS), Seq("src"))
          .join(broadcast(adjDst), Seq("dst"), "left")
          .agg(
            expr("sum(size(ns) - 1) div 2").as("w"),
            sum(when(col("ns2").isNull, 0L).otherwise(
              graft.functions.SortedIntersectCount.sortedIntersectCount(
                col("ns"), col("ns2")))).as("t"))
          .select(coalesce(col("w"), lit(0L)).as("wedges_sampled"),
            coalesce(col("t"), lit(0L)).as("triangles_sampled"))
      } else {
        val e1 = oS.select(col("src"), col("dst").as("v1"), col("dd").as("d1"))
        val e2 = oS.select(col("src"), col("dst").as("v2"), col("dd").as("d2"))
        val wedges = e1.join(e2, "src")
          .where(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("v1") < col("v2")))
          .select(col("v1"), col("v2"))
        val edgeSide = o.select(col("src").as("v1"), col("dst").as("v2"),
          lit(1).as("hit"))
        wedges.join(edgeSide.hint("SHUFFLE_HASH"), Seq("v1", "v2"), "left")
          .agg(count(lit(1)).as("wedges_sampled"),
            count(col("hit")).as("triangles_sampled"))
      }
    oS.select(col("src")).distinct()
      .agg(count(lit(1)).as("centers_sampled"))
      .crossJoin(wt)
      .select(col("centers_sampled"), col("wedges_sampled"),
        col("triangles_sampled"),
        expr(s"triangles_sampled * 16 div $sampleBuckets").as("triangles_est"))
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
  def pageRankScaled(edges: DataFrame, iters: Int, scale: Long = 1000000L,
                     broadcastBytesLimit: Long = -1L,
                     copartParts: Int = 0): DataFrame =
    pageRankLoop(
      symDeg(edges), expr("rank div den"), iters, scale, None,
      broadcastBytesLimit, copartParts)

  /** Weighted PageRank over `(u, v, w)` edges: identical contract to
    * [[pageRankScaled]] but rank splits proportionally to edge weight —
    * per-edge contribution is `(rank · w) div strength(src)` with
    * strength = Σ incident weights. Still exact integers end to end
    * (rank ≤ n·scale and weights are counts, so the product stays far
    * inside Long), so the unrolled DuckDB twin is bit-identical. Same
    * plan shape and scale posture as the unweighted loop.
    */
  def pageRankScaledWeighted(wEdges: DataFrame, iters: Int,
                             scale: Long = 1000000L,
                             broadcastBytesLimit: Long = -1L,
                             copartParts: Int = 0): DataFrame =
    pageRankLoop(
      symDegWeighted(wEdges), expr("(rank * w) div den"), iters, scale, None,
      broadcastBytesLimit, copartParts)

  /** Persist a rank table for later [[pageRankResume]] — the stored-index
    * amortization pattern (`Similarity.writeIvfIndex`): at warehouse
    * scale ranks persist between runs and each refresh pays only its
    * incremental rounds, not the cold-start iterations.
    */
  def writeRanks(ranks: DataFrame, path: String): Unit =
    ranks.write.mode("overwrite").parquet(path)

  def readRanks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Resume PageRank from a stored rank table: runs `iters` MORE rounds
    * of the identical update starting from `ranks0` instead of the
    * uniform init. `resume(writeRanks(pageRank(e, k)), j)` ≡
    * `pageRank(e, k + j)` — the oracle-checkable warm-start contract
    * (exact integer arithmetic makes the equivalence bit-for-bit).
    * `ranks0` must cover the graph's node set (it does when produced by
    * [[pageRankScaled]] on the same edge list).
    */
  def pageRankResume(edges: DataFrame, ranks0: DataFrame, iters: Int,
                     scale: Long = 1000000L,
                     broadcastBytesLimit: Long = -1L,
                     copartParts: Int = 0): DataFrame =
    pageRankLoop(
      symDeg(edges), expr("rank div den"), iters, scale, Some(ranks0),
      broadcastBytesLimit, copartParts)

  /** Store the unweighted walk table — symmetrized edges with the
    * per-source denominator, `(src, dst, den)` — as a BUCKETED catalog
    * table (bucketBy src). This moves the co-partitioned mode's
    * once-per-run edge shuffle to WRITE time: every later PageRank
    * refresh (cold or [[pageRankResume]]-style warm) reads the bucket
    * layout straight off disk and runs its rounds with ZERO exchanges
    * on the edge side, ever — the [[graft.operators.Bucketed]]
    * amortization applied to the iterative-graph family. Combined with
    * [[writeRanks]], a warehouse refresh touches only node-sized state
    * and per-round contributions.
    */
  def writeWalkTable(edges: DataFrame, name: String, path: String,
      buckets: Int): Unit = {
    val (sym, den) = symDeg(edges)
    val denCk = shims.checkpointWithStats(den)
    graft.operators.Bucketed.writeBucketed(
      sym.join(denCk, "src"), name, path, "src", buckets)
    // the walk table is on disk: the node-sized den blocks are dead
    // (the unpersist discipline every index writer follows)
    shims.unpersistLocalCheckpoint(denCk)
  }

  /** PageRank over a stored walk table: bit-identical ranks to
    * [[pageRankScaled]] on the same edge list (pinned in GraphSpec).
    * Always the co-partitioned shape — the bucketed scan provides
    * hash(src) from DISK, so the refresh's only edge-sized work is ONE
    * decode into a stats checkpoint (partitioning survives the
    * checkpoint — no shuffle anywhere; measured: iterating straight on
    * the scan instead re-decodes the parquet every round, 1.6× the
    * whole refresh at sf1), after which rounds run on blocks exactly
    * like the in-memory loop minus its derivation + repartition.
    * `buckets` must match the written bucket count or Spark re-shuffles
    * the mismatched side.
    */
  def pageRankOnWalkTable(spark: SparkSession, name: String, buckets: Int,
      iters: Int, scale: Long = 1000000L,
      ranks0: Option[DataFrame] = None): DataFrame = {
    // a BARE bucketed scan gets its layout disabled by the planner
    // (autoBucketedScan sees no operator demanding the distribution —
    // the demand comes three operators later, inside the rounds), which
    // would checkpoint FILE-partitioned rows and re-shuffle every
    // round; pin the layout on for the one decode
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf, "true")
    spark.conf.set(conf, "false")
    // layout-preserving: the bucketed hash(src) layout from disk is the
    // whole point, and withDeg/deg are single-reference per round plan
    val withDeg =
      try shims.checkpointWithStatsLayout(spark.table(name))
      finally spark.conf.set(conf, prev)
    val deg = shims.checkpointWithStatsLayout(
      withDeg.select(col("src"), col("den")).distinct())
    pageRankRounds(withDeg, deg, expr("rank div den"), iters, scale,
      ranks0, copart = true, parts = buckets)
  }

  /** Weighted twin of [[writeWalkTable]]: stores `(src, dst, w, den =
    * strength)` bucketed by src for [[pageRankWeightedOnWalkTable]].
    */
  def writeWalkTableWeighted(wEdges: DataFrame, name: String, path: String,
      buckets: Int): Unit = {
    val (sym, den) = symDegWeighted(wEdges)
    val denCk = shims.checkpointWithStats(den)
    graft.operators.Bucketed.writeBucketed(
      sym.join(denCk, "src"), name, path, "src", buckets)
    shims.unpersistLocalCheckpoint(denCk)
  }

  /** Weighted twin of [[pageRankOnWalkTable]]: contribution
    * `(rank·w) div den`, bit-identical to [[pageRankScaledWeighted]]
    * on the same weighted edges (pinned in GraphSpec).
    */
  def pageRankWeightedOnWalkTable(spark: SparkSession, name: String,
      buckets: Int, iters: Int, scale: Long = 1000000L,
      ranks0: Option[DataFrame] = None): DataFrame = {
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf, "true")
    spark.conf.set(conf, "false")
    val withDeg =
      try shims.checkpointWithStatsLayout(spark.table(name))
      finally spark.conf.set(conf, prev)
    val deg = shims.checkpointWithStatsLayout(
      withDeg.select(col("src"), col("den")).distinct())
    pageRankRounds(withDeg, deg, expr("(rank * w) div den"), iters, scale,
      ranks0, copart = true, parts = buckets)
  }

  /** Symmetrized edges + per-source denominator for the unweighted walk:
    * (src, dst, den = outdeg).
    */
  private def symDeg(edges: DataFrame): (DataFrame, DataFrame) = {
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
    (sym, sym.groupBy("src").agg(count(lit(1)).as("den")))
  }

  /** Weighted twin: (src, dst, w, den = strength = Σ incident w). */
  private def symDegWeighted(wEdges: DataFrame): (DataFrame, DataFrame) = {
    val sym = wEdges.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionAll(wEdges.select(col("v").as("src"), col("u").as("dst"), col("w")))
    (sym, sym.groupBy("src").agg(sum(col("w")).as("den")))
  }

  /** The shared damped-walk loop. EAGER contract: each round is
    * materialized via a stats-carrying checkpoint at CONSTRUCTION time
    * (documented at the registry entries); the returned frame is the
    * last round's plan over the previous round's blocks, so plan
    * inspection still sees one full round.
    *
    * Strategy is chosen from MEASURED stats, not hints:
    *
    *  - node table fits the session broadcast threshold → plain joins;
    *    Catalyst auto-broadcasts the rank side from the checkpoint's
    *    injected sizeInBytes, and each round's only edge-sized exchange
    *    is the groupBy(dst). No `broadcast()` anywhere.
    *  - past the threshold (web-graph node counts: a driver-assembled
    *    broadcast dies) → CO-PARTITIONED rounds: edges are hash-
    *    partitioned by src ONCE outside the loop, every round's rank
    *    table is re-partitioned on the same key/count (node-sized
    *    exchange), and the rank join is a SHUFFLE_HASH join that
    *    builds only the node-sized side per partition — the edge
    *    stream never re-shuffles for the join, its only per-round
    *    exchange is still the groupBy(dst).
    *
    * @param broadcastBytesLimit decision bound in BYTES for the node
    *   table (-1 = the session's `spark.sql.autoBroadcastJoinThreshold`)
    * @param copartParts partition count for the co-partitioned path
    *   (0 = the session's shuffle-partition width)
    */
  private def pageRankLoop(symAndDen: (DataFrame, DataFrame),
                           contribution: Column,
                           iters: Int, scale: Long,
                           ranks0: Option[DataFrame],
                           broadcastBytesLimit: Long,
                           copartParts: Int): DataFrame = {
    val (sym, denPlan) = symAndDen
    val spark = sym.sparkSession
    // layout-preserving variants throughout the loop: every checkpoint
    // here (deg, withDeg, per-round ranks) is consumed ONCE per round
    // plan, so the exchange-dedup hazard documented at
    // checkpointWithStatsLayout cannot bite, and in co-partitioned mode
    // the preserved hash layout is what makes rounds exchange-free
    val deg = shims.checkpointWithStatsLayout(denPlan)
    val degBytes = deg.queryExecution.optimizedPlan.stats.sizeInBytes
    val bcLimit = BigInt(
      if (broadcastBytesLimit >= 0) broadcastBytesLimit
      else shims.autoBroadcastThresholdBytes(spark))
    val copart = degBytes > bcLimit
    val parts =
      if (copartParts > 0) copartParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    // the edge-side table is built once, outside the loop; in the
    // co-partitioned path it is hash-partitioned by src here so no
    // round ever moves it again
    val withDegPlan = sym.join(deg, "src")
    val withDeg = shims.checkpointWithStatsLayout(
      if (copart) withDegPlan.repartition(parts, col("src")) else withDegPlan)
    pageRankRounds(withDeg, deg, contribution, iters, scale, ranks0,
      copart, parts)
  }

  /** The round body shared by the in-memory loop and the stored-table
    * entry ([[pageRankOnWalkTable]]): `withDeg` must already carry the
    * co-partitioned layout when `copart` is set — from an explicit
    * repartition+checkpoint (the loop above) or from a bucketed scan
    * (the stored path, where DISK is the materialization).
    */
  private def pageRankRounds(withDeg: DataFrame, deg: DataFrame,
                             contribution: Column,
                             iters: Int, scale: Long,
                             ranks0: Option[DataFrame],
                             copart: Boolean, parts: Int): DataFrame = {

    def align(r: DataFrame): DataFrame =
      if (copart) r.repartition(parts, col("n")) else r

    var ranks: DataFrame = shims.checkpointWithStatsLayout(align(
      ranks0.getOrElse(
        deg.select(col("src").as("n"), lit(scale).as("rank")))))
    var spentRounds: List[DataFrame] = Nil
    var result: DataFrame = ranks
    for (i <- 1 to iters) {
      // co-partitioned mode hints SHUFFLE_HASH on the node-sized side of
      // both joins: with both inputs already hash-partitioned on the key
      // the join is exchange-free, and the hash build is per-partition
      // node-sized — a sort-merge here would sort the edge partitions
      // every round for nothing
      val rankSide = if (copart) ranks.hint("SHUFFLE_HASH") else ranks
      val contrib = withDeg
        .join(rankSide, withDeg("src") === ranks("n"))
        .groupBy(col("dst"))
        .agg(sum(contribution).as("s"))
      val contribSide0 = contrib.withColumnRenamed("dst", "n")
      val contribSide =
        if (copart) contribSide0.hint("SHUFFLE_HASH") else contribSide0
      val next = deg.select(col("src").as("n"))
        .join(contribSide, Seq("n"), "left")
        .select(col("n"),
          expr(s"(15 * ${scale}L + 85 * coalesce(s, 0L)) div 100").as("rank"))
      if (i < iters) {
        val cp = shims.checkpointWithStatsLayout(align(next))
        // blocks from two rounds back are no longer reachable
        spentRounds.foreach(shims.unpersistLocalCheckpoint)
        spentRounds = List(ranks)
        ranks = cp
      } else {
        // last round stays lazy (plans remain inspectable); it reads only
        // `ranks`, deg and withDeg — the round before is now spent
        spentRounds.foreach(shims.unpersistLocalCheckpoint)
        spentRounds = Nil
        result = next
      }
    }
    if (iters == 0) result = ranks.select(col("n"), col("rank"))
    result
  }
}
