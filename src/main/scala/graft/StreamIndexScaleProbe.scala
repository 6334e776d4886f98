package graft

import org.apache.spark.sql.functions._

/** Prices the r12 VERDICT #5 question for the streaming-index families
  * (t13 raw IVF lists, t14 compressed IVF-PQ codes) at larger sf: how
  * does PROBE cost grow with accumulated shard count, and what does
  * drain-tail compaction buy — the A/B that decides whether a
  * continuously-fed 100 TB index needs the maintenance pass or can
  * coast on shard union forever. Also re-prices the train-once claim:
  * the standing model is timed separately from the per-shard folds.
  *
  * Usage: StreamIndexScaleProbe <sfDir> [cores=32] [nShards=30]
  *
  * Output (stderr-free, one line per measurement):
  *   [stream-scale] <family> <label> <seconds> [detail]
  */
object StreamIndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val nShards = if (args.length > 2) args(2).toInt else 30
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    import ext.Similarity

    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    emb.count() // warm the table read before any timed phase
    // materialized once OUTSIDE every timed section: a lazy filter over
    // the embeddings table would re-scan it for the query rows inside
    // each measured probe, adding a constant query-side term that
    // dilutes the compacted-vs-uncompacted contrast (r13 review)
    val queries = emb.filter(col("vec_id") < 10).cache()
    queries.count()

    def time[T](family: String, label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stream-scale] $family%-6s $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def minOf3(family: String, label: String)(probe: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = probe
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[stream-scale] $family%-6s $label%-34s ${ts.map(_._1).min}%7.2f s  (rows=${ts.head._2})")
    }
    def filesUnder(path: String): (Int, Int) = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) return (0, 0)
      val it = fs.listFiles(p, true)
      var files = 0
      while (it.hasNext) {
        val s = it.next()
        if (!s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")) files += 1
      }
      val shards = fs.listStatus(p).count(_.getPath.getName.startsWith("batch="))
      (shards, files)
    }
    val probeAt = Seq(3, 10, nShards).distinct.filter(_ <= nShards)

    // ---- t13: raw-vector inverted lists ------------------------------
    locally {
      val idx = streaming.DrainWork.tempDir("graft_sscale_ivf") + "/index"
      time("ivf", "model train (once)") {
        Similarity.writeIvfModel(emb, "vec_id", "embedding",
          nClusters = 4, iterations = 2, path = idx)
      }
      val sink = Similarity.ivfSink(idx, "vec_id", "embedding") _
      // sinks timed alone; the checkpoint probes run OUTSIDE the drain
      // accumulator so the published drain total is fold cost only
      // (r13 review: the first cut timed 6-9 probe executions inside it)
      var drainS = 0.0
      (0 until nShards).foreach { b =>
        val t0 = System.nanoTime()
        sink(emb.filter(pmod(col("vec_id"), lit(nShards)) === b), b.toLong)
        drainS += (System.nanoTime() - t0) / 1e9
        if (probeAt.contains(b + 1))
          minOf3("ivf", s"probe @ ${b + 1} shards") {
            Similarity.ivfTopKStreamed(spark, idx, queries,
                "vec_id", "embedding", nProbe = 2, k = 3).count()
          }
      }
      println(f"[stream-scale] ivf    $nShards-shard drain (sinks only)   $drainS%7.2f s")
      val (s0, f0) = filesUnder(s"$idx/lists")
      println(s"[stream-scale] ivf    layout before compact               shards=$s0 files=$f0")
      time("ivf", "compactShards (drain tail)") {
        Similarity.compactIvfLists(spark, idx)
      }
      val (s1, f1) = filesUnder(s"$idx/lists")
      println(s"[stream-scale] ivf    layout after compact                shards=$s1 files=$f1")
      minOf3("ivf", "probe compacted") {
        Similarity.ivfTopKStreamed(spark, idx, queries,
          "vec_id", "embedding", nProbe = 2, k = 3).count()
      }
    }

    // ---- t14: compressed residual codes ------------------------------
    locally {
      val idx = streaming.DrainWork.tempDir("graft_sscale_ivfpq") + "/index"
      time("ivfpq", "model train (once)") {
        Similarity.writeIvfPqModel(emb, "vec_id", "embedding", nCoarse = 4,
          coarseIters = 2, m = 4, subDim = 16, ks = 4, pqIters = 2, path = idx)
      }
      val sink = Similarity.ivfPqSink(idx, "vec_id", "embedding",
        m = 4, subDim = 16) _
      // sinks timed alone; the checkpoint probes run OUTSIDE the drain
      // accumulator so the published drain total is fold cost only
      // (r13 review: the first cut timed 6-9 probe executions inside it)
      var drainS = 0.0
      (0 until nShards).foreach { b =>
        val t0 = System.nanoTime()
        sink(emb.filter(pmod(col("vec_id"), lit(nShards)) === b), b.toLong)
        drainS += (System.nanoTime() - t0) / 1e9
        if (probeAt.contains(b + 1))
          minOf3("ivfpq", s"probe @ ${b + 1} shards") {
            Similarity.ivfPqTopKStreamed(spark, idx, queries,
                "vec_id", "embedding", m = 4, subDim = 16, nProbe = 2, k = 3).count()
          }
      }
      println(f"[stream-scale] ivfpq  $nShards-shard drain (sinks only)   $drainS%7.2f s")
      val (s0, f0) = filesUnder(s"$idx/codes")
      println(s"[stream-scale] ivfpq  layout before compact               shards=$s0 files=$f0")
      time("ivfpq", "compactShards (drain tail)") {
        Similarity.compactIvfPqCodes(spark, idx)
      }
      val (s1, f1) = filesUnder(s"$idx/codes")
      println(s"[stream-scale] ivfpq  layout after compact                shards=$s1 files=$f1")
      minOf3("ivfpq", "probe compacted") {
        Similarity.ivfPqTopKStreamed(spark, idx, queries,
          "vec_id", "embedding", m = 4, subDim = 16, nProbe = 2, k = 3).count()
      }
    }
    spark.stop()
  }
}
