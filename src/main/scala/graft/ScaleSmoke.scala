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
    time("simhash")(println("simhash: " + graft.ext.DedupOps.simhash(x10, "doc_id", "text").count()))
    spark.stop()
  }
}
