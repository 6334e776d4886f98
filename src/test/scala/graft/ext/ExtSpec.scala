package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ExtSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer plans and shuffles here"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("shingles produce len-n+1 word n-grams; empty when too short") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.shingles(col("t"), 3).as("sh")).as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1).isEmpty)
  }

  test("exactGroups collapses identical texts") {
    val g = DedupOps.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 3)
    val dupGroup = g.filter(col("n_docs") === 2).collect()
    assert(dupGroup.length == 1 && dupGroup.head.getAs[Long]("keep_id") == 1L)
  }

  test("jaccardPairs finds the near-dup pair and not the unrelated doc") {
    val pairs = DedupOps.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("lshCandidates surfaces near-dups; exact dups always collide") {
    val cand = DedupOps.lshCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 4L)), "exact dup must share every band")
    assert(!cand.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not collide")
  }

  test("simhash: identical texts equal; near-dups closer than unrelated (hamming)") {
    val m = DedupOps.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(m(1L) == m(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m(1L), m(2L)) < hamming(m(1L), m(3L)))
  }

  test("langId picks marker-majority language deterministically") {
    val r = Seq(
      "the cat is on a roof and the dog is here",
      "el gato y la casa de que y el perro",
      "zzz qqq www").toDF("t")
      .select(TextOps.langId(col("t"))).as[String].collect()
    assert(r.toSeq == Seq("en", "es", "unknown"))
  }

  test("cosine top-k: orthogonal vs identical vectors rank correctly") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),  // identical to query → cos 1.0
      (2L, Array(0.0f, 1.0f, 0.0f), 0),  // orthogonal → cos 0.0
      (3L, Array(0.7f, 0.7f, 0.0f), 0)   // 45° → cos ~0.707
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
      .orderBy(desc("cos_sim")).as[(Long, Long, Double)].collect()
    assert(top.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(top(0)._3 == 1.0 && top(2)._3 == 0.0)
    assert(math.abs(top(1)._3 - 0.707107) < 1e-6)
  }

  test("cosineNearDupLsh works at non-64 widths and matches the exact baseline") {
    val base = Array.tabulate(32)(i => (math.sin(i + 1) * 0.5).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val far = Array.tabulate(32)(i => (math.cos(3 * i + 2) * 0.5).toFloat)
    val emb = Seq((0L, base), (1L, near), (2L, far)).toDF("vec_id", "embedding")
    val lsh = Similarity.cosineNearDupLsh(emb, "vec_id", "embedding",
        threshold = 0.9, dims = 32)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val exact = Similarity.cosineNearDupExact(emb, "vec_id", "embedding", 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((0L, 1L)))
    assert(lsh == exact) // identical vectors-modulo-epsilon collide in every band
  }

  test("signBitBands fails fast on embedding/hyperplane width mismatch") {
    val emb = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.cosineNearDupLsh(emb, "vec_id", "embedding",
        threshold = 0.5, dims = 64).collect()
    }
    assert(ex.getMessage.contains("width"))
  }

  test("bucketedTopK only searches the query's bucket") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.1f), 0),  // same bucket
      (2L, Array(1.0f, 0.0f), 1)   // identical but other bucket → excluded
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.bucketedTopK(emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", "label", 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(r == Set(1L))
  }
}
