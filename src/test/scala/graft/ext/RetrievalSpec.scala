package graft.ext

import graft.SparkSuite

/** Hand-computed BM25 (rational variant) on an enumerable corpus, plus
  * the posting-semantics and determinism contracts.
  */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  // d1="a a b" (dl 3), d2="b c" (dl 2), d3="c c c c" (dl 4)
  // N=3, TL=9; terms {a,b}: tf (d1,a,2) (d1,b,1) (d2,b,1); df a=1 b=2
  // idf_s: a=(2*2+1)*1000//3=1666, b=(2*1+1)*1000//5=600
  // d1: (1666*22*2*9)//(10*9*2+3*9+9*3*3) = 659736//288 = 2290
  //   + (600*22*1*9)//(10*9*1+27+81)      = 118800//198 = 600  -> 2890
  // d2: (600*22*1*9)//(10*9*1+27+9*2*3)   = 118800//171 = 694
  private def corpus = Seq((1L, "a a b"), (2L, "b c"), (3L, "c c c c"))
    .toDF("doc_id", "text")

  test("hand-computed scores, only matching docs returned, order (score desc, id)") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("a", "b"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2890L), (2L, 694L))) // d3 has no query term
  }

  test("k truncates at the (score desc, id) boundary deterministically") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("a", "b"), k = 1)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2890L)))
  }

  test("partitioning does not change scores (integer sums are order-free)") {
    val wide = (1L to 200L)
      .map(i => (i, if (i % 3 == 0) "a b c a" else "c d e")).toDF("doc_id", "text")
    val one = Retrieval.bm25TopK(wide.coalesce(1), "doc_id", "text",
      Seq("a", "b"), 50).as[(Long, Long)].collect().toSeq
    val many = Retrieval.bm25TopK(wide.repartition(16), "doc_id", "text",
      Seq("a", "b"), 50).as[(Long, Long)].collect().toSeq
    assert(one == many)
  }

  test("a term absent from the corpus contributes nothing and breaks nothing") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("zzz", "b"), k = 10).as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
  }

  test("stored postings: bit-identical to the cold query, probe prunes to the terms' bands") {
    val wide = (1L to 300L)
      .map(i => (i, s"w${i % 7} w${i % 11} a b w${i % 5}")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_postings_spec").toString
    Retrieval.writePostings(wide, "doc_id", "text", path)
    val cold = Retrieval.bm25TopK(wide, "doc_id", "text", Seq("a", "w3"), 25)
      .as[(Long, Long)].collect().toSeq
    val stored = Retrieval.bm25TopKStored(spark, path, "doc_id", Seq("a", "w3"), 25)
    assert(stored.as[(Long, Long)].collect().toSeq == cold)
    // static partition pruning: the postings scan carries a tok_band
    // PartitionFilter, so only the query terms' band dirs are read
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tok_band"),
      s"postings scan is not partition-pruned:\n$plan")
  }
}
