package graft

import org.apache.spark.sql.functions._

/** Prices the r13 tiered-compaction claim: a MINOR pass (consolidate
  * only the new shards into an additional run) should cost the same
  * every time — proportional to the delta — while a MAJOR pass
  * (merge standing runs + shards into one) grows with the standing
  * index. Folds the embeddings corpus in as 30 IVF-list shards and
  * compacts after every 10, minor vs major, timing each pass; probes
  * after every pass to pin read parity across layouts.
  *
  * Usage: TieredCompactProbe <sfDir> [cores=32] [every=10]
  */
object TieredCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val every = if (args.length > 2) args(2).toInt else 10
    val nShards = 30
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    import ext.Similarity

    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    emb.count()
    val queries = emb.filter(col("vec_id") < 10).cache()
    queries.count()

    def run(mode: String, minor: Boolean): Unit = {
      val idx = streaming.DrainWork.tempDir(s"graft_tiered_$mode") + "/index"
      Similarity.writeIvfModel(emb, "vec_id", "embedding",
        nClusters = 4, iterations = 2, path = idx)
      val sink = Similarity.ivfSink(idx, "vec_id", "embedding") _
      (0 until nShards).foreach { b =>
        sink(emb.filter(pmod(col("vec_id"), lit(nShards)) === b), b.toLong)
        if ((b + 1) % every == 0) {
          val t0 = System.nanoTime()
          Similarity.compactIvfLists(spark, idx, minor = minor)
          val dt = (System.nanoTime() - t0) / 1e9
          // probe after every pass: read parity across minor/major
          // layouts is pinned in CompactSpec; here the probe just
          // proves the tiered layout serves identically-shaped results
          val probe = Similarity.ivfTopKStreamed(spark, idx, queries,
              "vec_id", "embedding", nProbe = 2, k = 3).count()
          println(f"[tiered] $mode%-6s pass @ ${b + 1}%2d shards  $dt%6.2f s  (probe rows=$probe)")
        }
      }
    }
    run("minor", minor = true)
    run("major", minor = false)
    spark.stop()
  }
}
