package graft

import org.apache.spark.sql.functions._

/** Scale probe for `batch=` shard-table compaction (Compact
  * .compactShards): turns SCALE.md's "shards compact offline like any
  * landing table" from a claim into a measurement. A streaming sink
  * leaves one directory per micro-batch forever; every probe/fold that
  * reads the table pays listing + footer + task-count costs that grow
  * with SHARD count, not byte count — at 100 TB with minute-level
  * batches that's ~1.4k shards/day on a table whose bytes barely move.
  *
  * Measures, at a given sfDir:
  *  1. BM25 streamed-index probe latency (min-of-3) with the postings
  *     split into N shards, then N/2+1 (half consolidated via `upTo`),
  *     then 1 (full consolidation) — with result parity asserted at
  *     each step (compaction is layout-only).
  *  2. The as-of fold's right-history read term: a fixed 1%-delta
  *     native as-of against the right store at N shards vs 1.
  *
  * Usage: runMain graft.ShardCompactProbe <sfDir> [shards=48]
  */
object ShardCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nShards = if (args.length > 1) args(1).toInt else 48
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[shardc] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def minOf3(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[shardc] $label%-42s ${ts.min}%8.2f s (min of 3)")
    }

    // ---- 1. BM25 probe latency vs postings shard count ----------------
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_shardc").toString
    timed(s"bm25 build as $nShards shards") {
      (0 until nShards).foreach { b =>
        ext.Retrieval.bm25Sink(idx, "doc_id", "text")(
          docs.filter(col("doc_id") % nShards === b), b.toLong)
      }
    }
    val terms = Seq("vector", "spark", "window")
    def probe() = ext.Retrieval
      .bm25TopKStreamed(spark, idx, "doc_id", terms, 20)
      .collect().map(_.toString).toSeq
    val want = probe()
    minOf3(s"probe @ $nShards shards")(probe())
    val rHalf = timed(s"compact upTo=${nShards / 2 - 1}")(
      ext.Retrieval.compactIndex(spark, idx, upTo = (nShards / 2 - 1).toLong))
    println(s"[shardc]   postings files ${rHalf.head.filesBefore} -> ${rHalf.head.filesAfter}")
    require(probe() == want, "probe changed after half compaction")
    minOf3(s"probe @ ${nShards / 2 + 1} shards")(probe())
    val rFull = timed("compact full")(ext.Retrieval.compactIndex(spark, idx))
    println(s"[shardc]   postings files ${rFull.head.filesBefore} -> ${rFull.head.filesAfter}")
    require(probe() == want, "probe changed after full compaction")
    minOf3("probe @ 1 shard")(probe())

    // ---- 2. as-of right-history read term vs shard count ---------------
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .select("event_id", "user_id", "ts", "event_type", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
    val views1pct = ev.filter(col("event_type") === "view")
      .filter(col("event_id") % 100 === 0)
      .select("event_id", "user_id", "ts")
    val rstore = java.nio.file.Files.createTempDirectory("graft_shardr").toString
    timed(s"right store as $nShards shards") {
      (0 until nShards).foreach(b => clicks
        .filter(col("click_id") % nShards === b)
        .write.mode("overwrite").parquet(s"$rstore/batch=$b"))
    }
    def fold(): Long = {
      val allR = operators.ShardStore.read(spark, rstore,
          operators.ShardStore.withBatch(clicks.schema))
        .drop("batch")
        .select("click_id", "user_id", "ts", "click_value")
      operators.AsOf.joinBackwardNative(views1pct, allR, Seq("user_id"),
        "ts", "ts", Seq("click_id", "click_value"), "click_id").count()
    }
    val wantRows = fold()
    minOf3(s"1% as-of fold @ $nShards right shards")(fold())
    timed("compact right store")(operators.Compact
      .compactShards(spark, rstore, targetBytes = 128L << 20))
    require(fold() == wantRows, "fold rows changed after compaction")
    minOf3("1% as-of fold @ 1 right shard")(fold())
    spark.stop()
  }
}
