package graft

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.functions._

/** Prices the READ side of the tiered (LSM) shard layout — the knob the
  * r13 TieredCompactProbe's write-side pricing left open (r13 VERDICT
  * #3): [[graft.operators.ShardStore.read]] builds one scan relation
  * per stacked RUN and union-reduces them, so plan size grows with run
  * count — what does a probe actually pay per run, and where should
  * `maxRuns` default?
  *
  * Method: per family (BM25 postings+doclen, IVF lists), train the
  * standing model once and fold the corpus in as 32 `batch=` shards
  * through the real sink — then CLONE that root per run count R and
  * compact each clone into exactly R stacked runs (R minor passes with
  * staged `upTo` watermarks; R=1 is one major pass). Per layout:
  * plan-build time (analysis→physical, no execution) and probe latency
  * (min of 3 executed probes), plus the raw 32-shard/no-manifest
  * baseline — which plans all shards as ONE multi-path relation, the
  * shape stacked runs deliberately trade against.
  *
  * Usage: RunCountProbe <sfDir> [cores=32] [shards=32]
  */
object RunCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val nShards = if (args.length > 2) args(2).toInt else 32
    val runCounts = Seq(1, 2, 4, 8, 16, 32).filter(_ <= nShards)
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    import ext.{Retrieval, Similarity}

    val conf = spark.sparkContext.hadoopConfiguration
    def clone(src: String, dst: String): Unit = {
      val f = new Path(src).getFileSystem(conf)
      if (!FileUtil.copy(f, new Path(src), f, new Path(dst), false, conf))
        sys.error(s"clone $src -> $dst failed")
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(body: => Unit): Double = (0 until 3).map(_ => timed(body)).min

    /** Stack the clone into exactly R runs: R staged minor passes
      * (major when R=1). maxRuns is lifted past R — the probe measures
      * layouts the default would refuse to build.
      */
    def stack(compactTo: (Long, Boolean, Int) => Unit, r: Int): Double = timed {
      (0 until r).foreach { i =>
        val upTo = ((i + 1).toLong * nShards / r) - 1
        compactTo(upTo, r > 1, r + 1)
      }
    }

    def report(family: String, baseRoot: String,
               compactTo: String => (Long, Boolean, Int) => Unit,
               planOnly: String => Unit, probe: String => Unit): Unit = {
      val rawPlan = minOf3(planOnly(baseRoot))
      val rawProbe = minOf3(probe(baseRoot))
      println(f"[runcount] $family%-5s R=raw($nShards%d shards) " +
        f"plan=$rawPlan%6.3f s  probe=$rawProbe%6.3f s")
      runCounts.foreach { r =>
        val root = s"${baseRoot}_r$r"
        clone(baseRoot, root)
        val stackS = stack(compactTo(root), r)
        val planS = minOf3(planOnly(root))
        val probeS = minOf3(probe(root))
        println(f"[runcount] $family%-5s R=$r%-3d stack=$stackS%6.2f s  " +
          f"plan=$planS%6.3f s  probe=$probeS%6.3f s")
      }
    }

    // ---- corpus + queries (cached OUTSIDE every timed section) ----
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    emb.count()
    val queries = emb.filter(col("vec_id") < 10).cache(); queries.count()
    val docs = Tables.documents(spark, dir).select("doc_id", "text").cache()
    docs.count()
    val terms = Seq("vector", "spark", "window")

    // ---- BM25 family ----
    val bmIdx = streaming.DrainWork.tempDir("graft_runcount_bm25") + "/index"
    val bmDrain = timed {
      (0 until nShards).foreach { b =>
        Retrieval.bm25Sink(bmIdx, "doc_id", "text")(
          docs.filter(pmod(col("doc_id"), lit(nShards)) === b), b.toLong)
      }
    }
    println(f"[runcount] bm25  drain ($nShards shards): $bmDrain%6.1f s")
    report("bm25", bmIdx,
      root => (upTo, minor, maxRuns) => {
        Retrieval.compactIndex(spark, root, upTo = upTo, minor = minor,
          maxRuns = maxRuns); ()
      },
      root => Retrieval.bm25TopKStreamed(spark, root, "doc_id", terms, k = 20)
        .queryExecution.executedPlan,
      root => Retrieval.bm25TopKStreamed(spark, root, "doc_id", terms, k = 20)
        .count())

    // ---- IVF family ----
    val ivfIdx = streaming.DrainWork.tempDir("graft_runcount_ivf") + "/index"
    Similarity.writeIvfModel(emb, "vec_id", "embedding",
      nClusters = 4, iterations = 2, path = ivfIdx)
    val ivfDrain = timed {
      (0 until nShards).foreach { b =>
        Similarity.ivfSink(ivfIdx, "vec_id", "embedding")(
          emb.filter(pmod(col("vec_id"), lit(nShards)) === b), b.toLong)
      }
    }
    println(f"[runcount] ivf   drain ($nShards shards): $ivfDrain%6.1f s")
    report("ivf", ivfIdx,
      root => (upTo, minor, maxRuns) => {
        Similarity.compactIvfLists(spark, root, upTo = upTo, minor = minor,
          maxRuns = maxRuns); ()
      },
      root => Similarity.ivfTopKStreamed(spark, root, queries,
        "vec_id", "embedding", nProbe = 2, k = 3)
        .queryExecution.executedPlan,
      root => Similarity.ivfTopKStreamed(spark, root, queries,
        "vec_id", "embedding", nProbe = 2, k = 3).count())

    spark.stop()
  }
}
