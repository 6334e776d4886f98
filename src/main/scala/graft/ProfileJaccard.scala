package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s   rows=$n")
    }
    time("shingleIndexHashed")(graft.ext.DedupOps.shingleIndexHashed(docs, "doc_id", "text").count())
    time("shingleIndexHashed again")(graft.ext.DedupOps.shingleIndexHashed(docs, "doc_id", "text").count())
    time("full jaccardPairs")(graft.ext.DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1).count())
    time("minhash signatures")(graft.ext.DedupOps.minhashSignatures(docs, "doc_id", "text").count())
    time("simhash")(graft.ext.DedupOps.simhash(docs, "doc_id", "text").count())
    spark.stop()
  }
}
