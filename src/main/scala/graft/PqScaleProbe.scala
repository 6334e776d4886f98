package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** PQ / IVF-PQ amortization probe (SCALE.md): on a scale dir, compare
  * the inline paths (codebook training + encode inside every query)
  * against the stored indexes (build once, probe per batch over the
  * ~64× compressed code table). Usage: PqScaleProbe <sfDir> [nCoarse=16]
  */
object PqScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nCoarse = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprobe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[pqprobe] corpus: ${emb.count()} vectors, nCoarse=$nCoarse")
    val batch1 = emb.filter(col("vec_id") < 10)
    val batch2 = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)

    time("pq inline build+search (b1)")(
      Similarity.pqTopK(emb, batch1, "vec_id", "embedding").count())
    time("pq inline build+search (b2)")(
      Similarity.pqTopK(emb, batch2, "vec_id", "embedding").count())
    val pqPath = java.nio.file.Files.createTempDirectory("pq_probe").toString
    time("pq index build+write (once)")(
      Similarity.writePqIndex(emb, "vec_id", "embedding",
        m = 4, subDim = 16, ks = 4, iterations = 2, path = pqPath))
    time("pq stored search (b1)")(
      Similarity.pqTopKStored(spark, pqPath, batch1, "vec_id", "embedding").count())
    time("pq stored search (b2)")(
      Similarity.pqTopKStored(spark, pqPath, batch2, "vec_id", "embedding").count())

    time("ivfpq inline build+search (b1)")(
      Similarity.ivfPqTopK(emb, batch1, "vec_id", "embedding",
        nCoarse = nCoarse).count())
    val ivfpqPath = java.nio.file.Files.createTempDirectory("ivfpq_probe").toString
    time("ivfpq index build+write (once)")(
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
        nCoarse = nCoarse, coarseIters = 2, m = 4, subDim = 16, ks = 4,
        pqIters = 2, path = ivfpqPath))
    time("ivfpq stored search (b1)")(
      Similarity.ivfPqTopKStored(spark, ivfpqPath, batch1, "vec_id",
        "embedding").count())
    time("ivfpq stored search (b2)")(
      Similarity.ivfPqTopKStored(spark, ivfpqPath, batch2, "vec_id",
        "embedding").count())
    spark.stop()
  }
}
