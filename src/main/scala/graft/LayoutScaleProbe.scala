package graft

import org.apache.spark.sql.functions._

/** Scale probe for the round-7 additions (SCALE.md): multi-source BFS,
  * histogram quantiles, and the bucketed co-located join. The bucketed
  * section measures the AMORTIZATION claim directly — one-time bucketed
  * write cost vs the per-query saving of a shuffle-free join — the same
  * build-once/query-many framing as IvfScaleProbe's stored index.
  *
  * Usage: LayoutScaleProbe <sfDir> [cores=16]
  */
object LayoutScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 16
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")

    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[layoutprobe] $n%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    // ---- multi-source BFS on the w>=2 backbone (frontier-driven)
    val bb = org.apache.spark.sql.graft.shims.checkpointWithStats(
      ext.Graph.coOccurrenceEdgesWeighted(
          Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
        .where(col("w") >= 2).select(col("u"), col("v")))
    time("bfs_hops (3 rounds)") {
      val seeds = ext.Graph.degrees(bb).select(col("n"))
        .filter(substring(md5(col("n").cast("string")), 1, 1) === "0")
      val r = ext.Graph.bfsHops(bb, seeds, rounds = 3)
      println(s"[layoutprobe]   settled = ${r.count()}")
    }

    // ---- weighted SSSP on the same backbone: per round one edge-scan
    //      against the improved-node set only
    time("sssp (3 rounds)") {
      val wbb = org.apache.spark.sql.graft.shims.checkpointWithStats(
        ext.Graph.coOccurrenceEdgesWeighted(
            Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
          .where(col("w") >= 2))
      val seeds = ext.Graph.degrees(wbb.select(col("u"), col("v")))
        .select(col("n"))
        .filter(substring(md5(col("n").cast("string")), 1, 1) === "0")
      val r = ext.Graph.ssspRounds(wbb, seeds, rounds = 3)
      println(s"[layoutprobe]   settled = ${r.count()}")
    }

    // ---- histogram quantiles: map-side partials, one 2 KB buffer per
    //      group — expect byte-linear scan cost
    time("hist_quantiles") {
      val n = Tables.documents(spark, dir).filter(col("n_chars").isNotNull)
        .groupBy(col("source"))
        .agg(functions.HistQuantile.histQuantiles(
          col("n_chars"), 0L, 4L, 256, Seq(50, 90, 99)).as("qs"))
        .count()
      println(s"[layoutprobe]   groups = $n")
    }

    // ---- global row numbering: bucket-rank + offset (one data
    //      shuffle) vs the single-reducer global window it replaces
    val li = Tables.lineitem(spark, dir)
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("k"))
    time("global_rownum (bucketed)") {
      val n = operators.GlobalIndex.rowNumber(li, Seq("k"), buckets = 256)
        .agg(max(col("rn"))).collect()(0).getLong(0)
      println(s"[layoutprobe]   rows = $n")
    }
    time("global_rownum (1-reducer)") {
      import org.apache.spark.sql.expressions.Window
      li.withColumn("rn", row_number().over(Window.orderBy(col("k"))))
        .agg(max(col("rn"))).collect()
    }

    // ---- stored walk table: cold PageRank (derive + shuffle edges per
    //      run) vs bucketed-layout rounds (edge shuffle paid at write)
    val coE = ext.Graph.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
    time("pagerank cold (3 rounds)")(
      ext.Graph.pageRankScaled(coE, iters = 3)
        .write.format("noop").mode("overwrite").save())
    val wtmp = java.nio.file.Files.createTempDirectory("graft_walk_probe").toString
    time("walk table write (once)")(
      ext.Graph.writeWalkTable(coE, "lp_walk", s"$wtmp/walk", buckets = 32))
    time("pagerank on walk table")(
      ext.Graph.pageRankOnWalkTable(spark, "lp_walk", 32, iters = 3)
        .write.format("noop").mode("overwrite").save())
    time("pagerank on walk table (repeat)")(
      ext.Graph.pageRankOnWalkTable(spark, "lp_walk", 32, iters = 3)
        .write.format("noop").mode("overwrite").save())

    // ---- BM25 amortization: cold query (explode per query) vs stored
    //      postings probe (explode paid once, band-pruned scan)
    val docs = Tables.documents(spark, dir)
    val terms = Seq("vector", "spark", "window")
    time("bm25 cold")(
      ext.Retrieval.bm25TopK(docs, "doc_id", "text", terms, 20).collect())
    val ppath = java.nio.file.Files.createTempDirectory("graft_post_probe").toString
    time("bm25 postings build (once)")(
      ext.Retrieval.writePostings(docs, "doc_id", "text", ppath))
    time("bm25 stored probe")(
      ext.Retrieval.bm25TopKStored(spark, ppath, "doc_id", terms, 20).collect())
    time("bm25 stored probe (repeat)")(
      ext.Retrieval.bm25TopKStored(spark, ppath, "doc_id", terms, 20).collect())

    // ---- bucketed join amortization: plain shuffle join vs one-time
    //      bucketed write + repeated shuffle-free joins
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .collect()
    // broadcast off: at warehouse scale NEITHER fact side fits memory —
    // the probe measures the shuffle-vs-bucketed regime, not dim joins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("plain shuffle join")(
      agg(orders.join(cust, col("o_custkey") === col("c_custkey"))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    time("bucketed write (once)") {
      operators.Bucketed.writeBucketed(orders, "lp_orders",
        s"$tmp/orders", "o_custkey", numBuckets = 32)
      operators.Bucketed.writeBucketed(cust, "lp_customer",
        s"$tmp/customer", "c_custkey", numBuckets = 32)
    }
    time("bucketed join (per query)")(
      agg(operators.Bucketed.coLocatedJoin(spark, "lp_orders", "lp_customer",
        "o_custkey", "c_custkey")))
    time("bucketed join (repeat)")(
      agg(operators.Bucketed.coLocatedJoin(spark, "lp_orders", "lp_customer",
        "o_custkey", "c_custkey")))
    spark.stop()
  }
}
