package graft

import org.apache.spark.sql.functions._

/** Scale probe for the round-10 streaming maintenance operators in the
  * regime they exist for: |delta| ≪ |standing|.
  *
  *  - BM25 postings maintenance (`Retrieval.bm25Sink`): index ~99% of
  *    the corpus as standing shards, then measure folding the last ~1%
  *    in, vs rebuilding the whole index from scratch. The fold
  *    tokenizes only the delta, so its cost must track the delta.
  *  - As-of mart maintenance (`StreamingAsOf.asOfSink`): build the
  *    standing mart from ~99% of the events, then fold the remaining
  *    ~1% (views AND clicks mixed — exercising both the new-left and
  *    late-right paths), vs the batch native as-of over everything.
  *
  * Both folds are differentially checked against their batch twins
  * (exact row parity) — the measurement is only meaningful if the
  * maintained state is still exact.
  *
  * Usage: runMain graft.StreamIncProbe <sfDir> (e.g. /tmp/graft_sf1)
  */
object StreamIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stinc] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- BM25 postings maintenance ------------------------------------
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val nDocs = docs.count()
    val standingDocs = docs.filter(col("doc_id") % 100 =!= 0)
    val deltaDocs = docs.filter(col("doc_id") % 100 === 0)
    println(s"[stinc] bm25: ${nDocs} docs, delta = ${deltaDocs.count()}")
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_probe").toString
    timed("bm25 standing build (99%)")(
      ext.Retrieval.bm25Sink(idx, "doc_id", "text")(standingDocs, 0L))
    timed("bm25 incremental fold (1%)")(
      ext.Retrieval.bm25Sink(idx, "doc_id", "text")(deltaDocs, 1L))
    val rebuild = java.nio.file.Files.createTempDirectory("graft_bm25_rb").toString
    timed("bm25 full rebuild (100%)")(
      ext.Retrieval.writePostings(docs, "doc_id", "text", rebuild))
    val terms = Seq("vector", "spark", "window")
    val streamed = timed("bm25 streamed probe")(
      ext.Retrieval.bm25TopKStreamed(spark, idx, "doc_id", terms, 20)
        .collect().map(_.toString).toSeq)
    val batch = ext.Retrieval.bm25TopK(docs, "doc_id", "text", terms, 20)
      .collect().map(_.toString).toSeq
    println(s"[stinc] bm25 maintained == batch: ${streamed == batch} (must be true)")

    // ---- as-of mart maintenance ---------------------------------------
    // the delta is a TIME slice (the last ~1% of event time), the shape
    // a real ingest stream delivers — arrival order ≈ event order. An
    // id-sampled delta is adversarial by construction: it touches ~half
    // the mart's KEYS (so the B-path re-as-ofs half the mart) and spans
    // the whole time range (so the tolerance prune on the right history
    // is inert); measured that way the fold costs O(mart ∩ hot keys),
    // which is exactly what the operator documents it costs — the
    // delta-driven claim is about delta-shaped deltas.
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .select("event_id", "user_id", "ts", "event_type", "value")
    val cutoff = ev.select(percentile_approx(col("ts"), lit(0.99), lit(1000))
      .as("c")).head().getTimestamp(0)
    val standingEv = ev.filter(col("ts") < lit(cutoff))
    val deltaEv = ev.filter(col("ts") >= lit(cutoff))
    println(s"[stinc] asof: ${ev.count()} events, delta = ${deltaEv.count()} (time-sliced)")
    def split(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts"),
      df.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value").as("click_value")))
    val tol = Some(6L * 3600 * 1000000)
    val work = java.nio.file.Files.createTempDirectory("graft_asof_probe").toString
    val swapSink = streaming.StreamingAsOf.asOfSink(s"$work/smart", s"$work/sclicks",
      split, "event_id", Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id", tol) _
    timed("asof swap standing build (99%)")(swapSink(standingEv, 0L))
    timed("asof swap fold (1%)")(swapSink(deltaEv, 1L))
    val sink = streaming.StreamingAsOf.asOfSinkPartitioned(s"$work/mart",
      s"$work/clicks", split, "event_id", Seq("user_id"), "ts", "ts",
      Seq("click_id", "click_value"), "click_id", tol) _
    timed("asof part standing build (99%)")(sink(standingEv, 0L))
    timed("asof part fold (1%)")(sink(deltaEv, 1L))
    val mart = timed("asof mart read")(
      streaming.StreamingAsOf.readMart(spark, s"$work/mart", "ts",
          Seq("click_id", "click_value"), tol)
        .select("event_id", "user_id", "click_id", "click_value", "asof_lag_us")
        .collect().map(_.toString).sorted.toSeq)
    val (views, clicks) = split(ev)
    val asofBatch = timed("asof batch twin (100%)")(
      operators.AsOf.joinBackwardNative(views, clicks, Seq("user_id"),
          "ts", "ts", Seq("click_id", "click_value"), "click_id", tol)
        .select("event_id", "user_id", "click_id", "click_value", "asof_lag_us")
        .collect().map(_.toString).sorted.toSeq)
    println(s"[stinc] asof maintained == batch: ${mart == asofBatch} (must be true)")
    spark.stop()
  }
}
