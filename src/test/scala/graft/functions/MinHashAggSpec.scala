package graft.functions

import graft.SparkSuite
import graft.ext.DedupOps

class MinHashAggSpec extends SparkSuite {

  test("sketch aggregate matches the k-separate-min formulation byte-for-byte") {
    val docs = graft.Tables.documents(spark, sfDir)
    val a = DedupOps.minhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val b = DedupOps.minhashSignaturesAgg(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("partial buffers merge correctly across repartitionings") {
    import spark.implicits._
    val df = Seq((1L, "aa"), (1L, "bb"), (1L, "cc"), (2L, "aa"))
      .toDF("id", "shingle")
    def sig(parts: Int) = df.repartition(parts)
      .groupBy($"id").agg(MinHashAgg.minhashSig($"shingle", 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sig(1) == sig(5)) // merge path exercised at 5 partitions
  }
}
