package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Guide §1 decomposition of the ANN build family (VERDICT r16 top_next):
  * per-phase wall-clock AND job/stage counts for the IVF / PQ / IVF-PQ
  * builders and searches — the evidence for WHERE the 2.5–5.6 s bench
  * cost of x_ann_ivfpq / t14 actually goes (at sf0.1 the corpus is 2000
  * vectors ≈ 0.5 MB, so the suspect is orchestration: sequential jobs,
  * nested broadcast builds, schema inference — not data).
  *
  * Usage: AnnPhaseProbe <sfDir> [cores=32] [reps=3]
  */
object AnnPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new LongAdder; val stages = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.add(1)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.add(1)
    })
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    emb.count() // warm table read
    def time[T](label: String)(f: => T): Unit = {
      val samples = (1 to reps).map { _ =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val (j0, s0) = (jobs.sum, stages.sum)
        val t0 = System.nanoTime()
        f
        shims.waitForListenerBus(spark.sparkContext)
        ((System.nanoTime() - t0) / 1e9, jobs.sum - j0, stages.sum - s0)
      }
      val best = samples.minBy(_._1)
      println(f"[ann-phase] $label%-34s ${best._1}%6.2f s  jobs=${best._2}%3d stages=${best._3}%3d")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val q = emb.filter(col("vec_id") < 10)

    time("corpus.count (auto decision)") { emb.count() }
    time("ivfCentroids(4,2)+ckpt") {
      val c = shims.checkpointWithStats(
        ext.Similarity.ivfCentroids(emb, "vec_id", "embedding", 4, 2))
      shims.unpersistLocalCheckpoint(c)
    }
    time("ivfTopK total") {
      noop(ext.Similarity.ivfTopK(emb, q, "vec_id", "embedding", 4, 2, 2, 3))
    }
    time("pqCodebooks(4,16,4,2)+ckpt") {
      val b = shims.checkpointWithStats(
        ext.Similarity.pqCodebooks(emb, "vec_id", "embedding", 4, 16, 4, 2))
      shims.unpersistLocalCheckpoint(b)
    }
    time("pqTopK total") {
      noop(ext.Similarity.pqTopK(emb, q, "vec_id", "embedding", 4, 16, 4, 2, 3))
    }
    time("ivfPqTopK total") {
      noop(ext.Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
        4, 2, 4, 16, 4, 2, 2, 3))
    }
    val idx = streaming.DrainWork.tempDir("graft_ann_phase")
    time("writeIvfPqIndex (build)") {
      ext.Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
        4, 2, 4, 16, 4, 2, s"$idx/w")
    }
    time("ivfPqTopKStored (probe)") {
      noop(ext.Similarity.ivfPqTopKStored(spark, s"$idx/w", q,
        "vec_id", "embedding", 4, 16, 2, 3))
    }
    time("writeIvfIndex (build)") {
      ext.Similarity.writeIvfIndex(emb, "vec_id", "embedding", 4, 2, s"$idx/i")
    }
    time("ivfTopKStored (probe)") {
      noop(ext.Similarity.ivfTopKStored(spark, s"$idx/i", q,
        "vec_id", "embedding", 2, 3))
    }
    time("writeIvfPqModel (t14 phase 1)") {
      ext.Similarity.writeIvfPqModel(emb, "vec_id", "embedding",
        4, 2, 4, 16, 4, 2, s"$idx/m")
    }
    time("ivfPqSink 1 batch (t14 fold)") {
      ext.Similarity.ivfPqSink(s"$idx/m", "vec_id", "embedding", 4, 16)(
        emb.toDF(), 0L)
    }
    time("t14 end-to-end") {
      noop(ext.Similarity.availableNowIvfPq(spark, dir))
    }
    time("t13 end-to-end") {
      noop(ext.Similarity.availableNowIvf(spark, dir))
    }
    spark.stop()
  }
}
