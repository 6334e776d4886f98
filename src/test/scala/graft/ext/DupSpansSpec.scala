package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DupSpansSpec extends SparkSuite {
  import spark.implicits._

  test("maximal runs of cross-doc 3-grams merge into islands; unique text emits nothing") {
    // docs 1 & 2 share the 6-word block "q w e r t y" (4 consecutive
    // 3-grams) and the isolated trigram "x y z"; doc 3 is unique
    val docs = Seq(
      (1L, "a b q w e r t y c d x y z e f"),
      (2L, "m n o x y z p q w e r t y u"),
      (3L, "completely different words with no shared trigram at all")
    ).toDF("doc_id", "text")
    val spans = DedupOps.dupSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (1L, 2L, 7L, 6L, 4L),   // "q w e r t y" at words 2-7: 4 trigrams
      (1L, 10L, 12L, 3L, 1L), // "x y z" at words 10-12
      (2L, 3L, 5L, 3L, 1L),   // "x y z" at words 3-5
      (2L, 7L, 12L, 6L, 4L))) // "q w e r t y" at words 7-12
  }

  test("overlapping duplicated regions merge into one span, not several") {
    // "a b c d" shared with doc 20, "c d e f" shared with doc 30: doc 10's
    // duplicated trigram positions 0..3 are consecutive → ONE span 0-5
    val docs = Seq(
      (10L, "a b c d e f"),
      (20L, "z z a b c d z"),
      (30L, "y c d e f y y")
    ).toDF("doc_id", "text")
    val d10 = DedupOps.dupSpans(docs, "doc_id", "text")
      .filter($"doc_id" === 10L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(d10 == Seq((10L, 0L, 5L, 6L, 4L)))
  }

  test("minDocs raises the df bar; within-doc repetition alone never marks") {
    val docs = Seq(
      (1L, "r e p r e p r e p"), // "r e p" repeats only within this doc
      (2L, "s h a r e d o n e"),
      (3L, "s h a r e d t w o"),
      (4L, "s h a r e d s i x")
    ).toDF("doc_id", "text")
    val at2 = DedupOps.dupSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
    // df counts DISTINCT docs: doc 1's self-repeats (df=1) never mark...
    assert(at2.filter($"doc_id" === 1L).count() == 0)
    // ...while "s h a r e d" (df=3) marks all three sharers
    assert(at2.filter($"doc_id".isin(2L, 3L, 4L)).count() == 3)
    // raising the bar above the true df clears everything
    assert(DedupOps.dupSpans(docs, "doc_id", "text", n = 3, minDocs = 4).count() == 0)
  }

  test("span removal keeps the first occurrence, cuts the rest, passes unique docs through") {
    val docs = Seq(
      (1L, "a b q w e r t y c d"), // keeper of "q w e r t y" (min doc_id)
      (2L, "m n q w e r t y o p"), // loses the 6 shared words
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val r = DedupOps.removeDupSpans(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) == (1L, "a b q w e r t y c d", 0L)) // keeper: untouched
    assert(r(2L) == (2L, "m n o p", 6L))             // span cut, rest reassembled
    assert(r(3L) == (3L, "nothing shared here at all", 0L))
    assert(r.size == 3) // every input doc comes back
  }

  test("a fully-duplicated non-keeper doc comes back empty, not missing") {
    val docs = Seq(
      (5L, "x y z w"),
      (9L, "x y z w") // every trigram shared, doc 9 is never the keeper
    ).toDF("doc_id", "text")
    val r = DedupOps.removeDupSpans(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(5L) == (5L, "x y z w", 0L))
    assert(r(9L) == (9L, "", 4L))
  }

  test("incremental candidates equal the cross-split subset of the full LSH join") {
    val docs = graft.Tables.documents(spark, sfDir)
    val withB = Corpus.assignSplit(docs, "doc_id")
    val corpus = withB.filter($"bucket" < 204)
    val fresh = withB.filter($"bucket" >= 204)
    val corpusSigs = DedupOps.minhashSignatures(corpus, "doc_id", "text")
    val got = DedupOps.lshCandidatesIncremental(corpusSigs, fresh, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // reference: the FULL all-pairs LSH run, restricted to pairs that
    // straddle the split (order-normalized to (fresh, corpus))
    val freshIds = fresh.select($"doc_id").as[Long].collect().toSet
    val full = DedupOps.lshCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        if (freshIds(a) && !freshIds(b)) Some((a, b))
        else if (freshIds(b) && !freshIds(a)) Some((b, a))
        else None
      }.toSet
    assert(got == full && got.nonEmpty)
  }

  test("agrees with an independent brute-force formulation on real data") {
    val docs = graft.Tables.documents(spark, sfDir).limit(200)
    val got = DedupOps.dupSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // brute force: string-keyed df (no xxhash64), islands via groupBy on
    // collected positions per doc — different plan, same answer
    val pos = docs.select(col("doc_id"),
        posexplode(graft.functions.WordShingles.shingles(col("text"), 3))
          .as(Seq("pos", "shingle")))
    val dupSh = pos.select($"doc_id", $"shingle").distinct()
      .groupBy($"shingle").count().filter($"count" >= 2).select($"shingle")
    val byDoc = pos.join(dupSh, Seq("shingle"))
      .select($"doc_id", $"pos").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = byDoc.flatMap { case (doc, ps) =>
      // fold sorted positions into maximal consecutive runs
      ps.foldLeft(List.empty[(Int, Int, Int)]) {
        case ((s, e, k) :: acc, p) if p == e + 1 => (s, p, k + 1) :: acc
        case (acc, p) => (p, p, 1) :: acc
      }.map { case (s, e, k) => (doc, s.toLong, e + 2L, e + 2L - s + 1L, k.toLong) }
    }.toSet
    assert(got == expected && got.nonEmpty)
  }
}
