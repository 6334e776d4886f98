package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale smoke for the dedup family's scale path: replicates the
  * sf0.1 documents table to 50k docs (ids offset per copy, text salted
  * per copy so copies aren't exact dups) and runs MinHash+LSH end-to-end.
  * Validates that the banded-join path stays near-linear where the
  * all-pairs Jaccard join would grow ~quadratically on this dense-vocab
  * synthetic corpus.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val x10 = (0 until 10).map { i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" copysalt$i")).as("text"))
    }.reduce(_ unionByName _)
    x10.cache(); println(s"docs: ${x10.count()}")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val sigs = time("minhash signatures") {
      val s = graft.ext.DedupOps.minhashSignatures(x10, "doc_id", "text"); s.count(); s
    }
    time("lsh candidates")(
      println("candidates: " + graft.ext.DedupOps.lshCandidates(x10, "doc_id", "text").count()))
    time("dedup resolution") {
      // convergence telemetry: rounds should stay ~log(component
      // diameter) as data scales — a super-logarithmic count here is the
      // early-warning signal for the iterative path
      val (labels, rounds) = graft.ext.DedupOps.resolveComponentsCounted(
        graft.ext.DedupOps.lshCandidates(x10, "doc_id", "text"))
      println(s"resolved: ${labels.count()} labeled docs in $rounds rounds")
    }
    time("simhash")(println("simhash: " + graft.ext.DedupOps.simhash(x10, "doc_id", "text").count()))
    time("vocabulary top-50")(
      println("vocab: " + graft.ext.Corpus.vocabulary(x10, "doc_id", "text", 50).count()))
    time("tfidf top-3")(
      println("tfidf rows: " + graft.ext.Corpus.tfidfTop(x10, "doc_id", "text", 3).count()))
    time("decontaminate") {
      val withB = graft.ext.Corpus.assignSplit(x10, "doc_id")
      println("contaminated: " + graft.ext.Corpus.contamination(
        withB.filter(col("bucket") < 204), withB.filter(col("bucket") >= 230),
        "doc_id", "text", n = 5).count())
    }
    time("pack sequences") {
      val sharded = x10.withColumn("shard", pmod(col("doc_id"), lit(64L)))
      val packed = graft.ext.Corpus.packSequences(sharded, "doc_id", "text", "shard", 512)
      println("max packs/shard: " + packed.groupBy(col("shard"))
        .agg(max(col("pack_id")).as("m")).agg(max(col("m"))).collect().head.getLong(0))
    }

    // embeddings ×10: per-copy perturbation keeps copies near- but not
    // exactly-collinear, so the LSH pair count grows output-proportionally
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val embX10 = (0 until 10).map { i =>
      val pert = Array.tabulate(64)(d => (math.sin(i * 64 + d) * 0.01))
      emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        zip_with(col("embedding"), typedLit(pert.toSeq),
          (x, p) => (x + p).cast("float")).as("embedding"))
    }.reduce(_ unionByName _)
    embX10.cache(); println(s"vectors: ${embX10.count()}")
    // production banding: 64 planes in 4×16-bit bands — the same sizing
    // the registered x_embed_neardup_lsh now runs (the 16/4 parameters,
    // kept as x_embed_neardup_lsh_demo, give only 16 buckets per band —
    // at 20k vectors that degenerates to ~n²/4 candidate pairs)
    time("embed neardup lsh")(
      println("neardup pairs: " + graft.ext.Similarity.cosineNearDupLsh(
        embX10, "vec_id", "embedding", 0.4, nPlanes = 64, rowsPerBand = 16).count()))
    spark.stop()
  }
}
