package graft

import org.apache.spark.sql.functions._

/** Measures the t14 amortization claim: maintaining the IVF-PQ code
  * table per micro-batch (residual-encode the DELTA against the
  * standing model) vs rebuilding the whole index per refresh. The
  * fold's cost should track the delta (plus a model-read constant),
  * not the corpus — the StreamIncProbe posture at the compressed
  * layout.
  *
  * Usage: IvfPqIncProbe <sfDir> [cores=32] [deltaPct=1]
  */
object IvfPqIncProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val deltaPct = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    emb.count() // warm the table read before any timed phase
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfpq-inc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val idx = streaming.DrainWork.tempDir("graft_ivfpq_inc")
    time("model train (once)") {
      ext.Similarity.writeIvfPqModel(emb, "vec_id", "embedding",
        nCoarse = 4, coarseIters = 2, m = 4, subDim = 16, ks = 4,
        pqIters = 2, path = idx)
    }
    // standing corpus encoded as batch 0; the delta arrives as batch 1
    val delta = emb.filter(col("vec_id") % 100 < deltaPct)
    val standing = emb.filter(col("vec_id") % 100 >= deltaPct)
    val (standingN, deltaN) = (standing.count(), delta.count())
    time(s"sink: standing $standingN vecs") {
      ext.Similarity.ivfPqSink(idx, "vec_id", "embedding", m = 4,
        subDim = 16)(standing.toDF(), 0L)
    }
    (1 to 3).foreach { r =>
      time(s"sink: $deltaN-vec delta (rep $r)") {
        ext.Similarity.ivfPqSink(idx, "vec_id", "embedding", m = 4,
          subDim = 16)(delta.toDF(), r.toLong)
      }
    }
    val full = streaming.DrainWork.tempDir("graft_ivfpq_full")
    time("full rebuild (model+encode)") {
      ext.Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
        nCoarse = 4, coarseIters = 2, m = 4, subDim = 16, ks = 4,
        pqIters = 2, path = full)
    }
    spark.stop()
  }
}
