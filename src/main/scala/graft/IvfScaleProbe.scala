package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Stored-IVF amortization probe (SCALE.md): on a scale dir, compare
  * the inline path (k-means build inside every query) against the
  * stored index (build once, then per-batch search with DPP-pruned
  * scans). Usage: IvfScaleProbe <sfDir> [nClusters=16]
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nClusters = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[ivfprobe] corpus: ${emb.count()} vectors, $nClusters clusters")
    val batch1 = emb.filter(col("vec_id") < 10)
    val batch2 = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)

    time("inline build+search (batch1)")(
      Similarity.ivfTopK(emb, batch1, "vec_id", "embedding",
        nClusters = nClusters, iterations = 2, nProbe = 2, k = 3).count())
    time("inline build+search (batch2)")(
      Similarity.ivfTopK(emb, batch2, "vec_id", "embedding",
        nClusters = nClusters, iterations = 2, nProbe = 2, k = 3).count())

    val path = java.nio.file.Files.createTempDirectory("ivf_probe").toString
    time("index build+write (once)")(
      Similarity.writeIvfIndex(emb, "vec_id", "embedding",
        nClusters = nClusters, iterations = 2, path = path))
    time("stored search (batch1)")(
      Similarity.ivfTopKStored(spark, path, batch1, "vec_id", "embedding",
        nProbe = 2, k = 3).count())
    time("stored search (batch2)")(
      Similarity.ivfTopKStored(spark, path, batch2, "vec_id", "embedding",
        nProbe = 2, k = 3).count())
    spark.stop()
  }
}
