package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Prices IVF centroid training — full-corpus Lloyd vs the bounded
  * md5-sample trainer ([[ext.Similarity.ivfCentroidsSampled]]) — at the
  * corpus-sized cluster count (√n rule, [[ext.Similarity.sizedNClusters]]).
  *
  * Full Lloyd assignment is n·k dot products per iteration — n^1.5 per
  * round under the √n rule, the one superlinear term in the IVF build.
  * The sampled trainer fits on ~64·k vectors instead, paying the full
  * corpus only the single list-assignment pass. The question this probe
  * answers with numbers: what does sampling buy in build time, and what
  * does it cost in search quality? Recall@k is measured for BOTH
  * trainers against the same brute-force ground truth, so the delta
  * isolates the training method (identical nClusters/nProbe/k).
  *
  * Usage: graft.IvfSampledProbe [dir1] [dir2] ...
  */
object IvfSampledProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (iters, k, nQueries) = (2, 10, 20)
    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d).cache()
      val n = emb.count()
      val nClusters = Similarity.sizedNClusters(n)
      val nProbe = math.max(1, nClusters / 10)
      val queries = emb.orderBy(col("vec_id")).limit(nQueries).cache()
      queries.count()
      // ground truth once: brute-force cosine top-k per query
      val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id")).cache()
      truth.count()
      def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
        val hit = truth.join(res.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        hit.toDouble / truth.count()
      }
      def timed[A](body: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = body
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // full-corpus Lloyd: train time = centroid derivation forced alone
      val (fullCents, fullTrainS) = timed {
        val c = Similarity.ivfCentroids(emb, "vec_id", "embedding", nClusters, iters)
        c.count(); c
      }
      val fullRecall = recallOf(Similarity.ivfTopKWithCentroids(
        emb, queries, "vec_id", "embedding", fullCents, nProbe, k))
      val (sampCents, sampTrainS) = timed {
        val c = Similarity.ivfCentroidsSampled(
          emb, "vec_id", "embedding", nClusters, iters)
        c.count(); c
      }
      val sampRecall = recallOf(Similarity.ivfTopKWithCentroids(
        emb, queries, "vec_id", "embedding", sampCents, nProbe, k))
      println(s"""{"probe":"ivf_sampled","dir":"$d","rows":$n,""" +
        s""""n_clusters":$nClusters,"n_probe":$nProbe,"k":$k,""" +
        s""""full_train_s":${f"$fullTrainS%.2f"},""" +
        s""""sampled_train_s":${f"$sampTrainS%.2f"},""" +
        s""""full_recall":${f"$fullRecall%.3f"},""" +
        s""""sampled_recall":${f"$sampRecall%.3f"}}""")
      // PQ twin: same question for the quantizer trainer (m=4 subspaces,
      // ks=16 codes — richer than the registry demo's ks=4 so recall has
      // room to differ; training is corpus-bound per Lloyd round)
      val (pqM, pqSub, pqKs) = (4, 16, 16)
      val (fullBooks, pqFullS) = timed {
        val b = Similarity.pqCodebooks(emb, "vec_id", "embedding",
          pqM, pqSub, pqKs, iters)
        b.count(); b
      }
      val pqFullRecall = recallOf(Similarity.pqTopKWithCodebooks(
        emb, queries, "vec_id", "embedding", fullBooks, pqM, pqSub, k))
      val (sampBooks, pqSampS) = timed {
        val b = Similarity.pqCodebooksSampled(emb, "vec_id", "embedding",
          pqM, pqSub, pqKs, iters)
        b.count(); b
      }
      val pqSampRecall = recallOf(Similarity.pqTopKWithCodebooks(
        emb, queries, "vec_id", "embedding", sampBooks, pqM, pqSub, k))
      println(s"""{"probe":"pq_sampled","dir":"$d","rows":$n,""" +
        s""""m":$pqM,"ks":$pqKs,"k":$k,""" +
        s""""full_train_s":${f"$pqFullS%.2f"},""" +
        s""""sampled_train_s":${f"$pqSampS%.2f"},""" +
        s""""full_recall":${f"$pqFullRecall%.3f"},""" +
        s""""sampled_recall":${f"$pqSampRecall%.3f"}}""")
      truth.unpersist(); queries.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
