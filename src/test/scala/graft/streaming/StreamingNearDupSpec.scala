package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.Tables
import graft.ext.DedupOps
import graft.streaming.StreamingNearDup._

class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("map-only bandKeys is byte-identical to the batch signature+banding path") {
    val scalar = bandKeys(docs, "doc_id", "text")
      .select("doc_id", "band_idx", "band_key")
      .collect().map(_.toString).sorted.toSeq
    val batch = DedupOps.lshBands(
        DedupOps.minhashSignatures(docs, "doc_id", "text"), "doc_id")
      .select("doc_id", "band_idx", "band_key")
      .collect().map(_.toString).sorted.toSeq
    assert(scalar == batch && scalar.nonEmpty)
  }

  test("docs with no shingles emit no bands (matches batch explode semantics)") {
    val tiny = Seq((1L, "only two"), (2L, Seq.fill(5)("w").mkString(" ")),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val ids = bandKeys(tiny, "doc_id", "text").select("doc_id")
      .distinct().as[Long].collect().toSet
    assert(ids == Set(2L)) // 2-word and NULL texts have no 3-shingles
  }

  test("batch-mode candidatePairs equals lshCandidates") {
    val got = candidatePairs(bandKeys(docs, "doc_id", "text").as[BandDoc])
      .toDF().distinct().collect().map(_.toString).sorted.toSeq
    val want = DedupOps.lshCandidates(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("cross-batch pairs come out of band state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BandDoc]
    val q = candidatePairs(mem.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("neardup_out").start()
    try {
      mem.addData(BandDoc(0, "k1", 10L), BandDoc(0, "k1", 3L), BandDoc(1, "k9", 10L))
      q.processAllAvailable()
      val batch1 = spark.table("neardup_out").as[CandidatePair].collect().toSet
      assert(batch1 == Set(CandidatePair(3L, 10L))) // within-batch, canonical a<b
      // second batch: doc 7 shares band (0,k1) with BOTH earlier docs,
      // doc 20 shares only (1,k9) with doc 10
      mem.addData(BandDoc(0, "k1", 7L), BandDoc(1, "k9", 20L))
      q.processAllAvailable()
      val all = spark.table("neardup_out").as[CandidatePair].collect().toSet
      assert(all == Set(CandidatePair(3L, 10L), CandidatePair(3L, 7L),
        CandidatePair(7L, 10L), CandidatePair(10L, 20L)))
      // re-sending a seen doc adds no pairs (state dedup)
      mem.addData(BandDoc(0, "k1", 7L))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() == 4)
    } finally q.stop()
  }

  test("maxDocsPerBand caps state: flooded band stops emitting") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BandDoc]
    val q = candidatePairs(mem.toDS(), maxDocsPerBand = 2)
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("neardup_cap").start()
    try {
      mem.addData(BandDoc(0, "hot", 1L), BandDoc(0, "hot", 2L))
      q.processAllAvailable()
      mem.addData(BandDoc(0, "hot", 3L), BandDoc(0, "hot", 4L)) // over cap
      q.processAllAvailable()
      val n = spark.table("neardup_cap").count()
      assert(n == 1) // only (1,2); the flood past the cap emits nothing
    } finally q.stop()
  }

  test("TTL misconfiguration fails at construction, not per-group at runtime") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val bands = bandKeys(docs, "doc_id", "text").as[BandDoc]
    intercept[IllegalArgumentException] {
      candidatePairs(bands, timeout = GroupStateTimeout.ProcessingTimeTimeout)
    } // ttlMs defaults to 0 — setTimeoutDuration(0) would throw per group
  }

  test("TTL ages dormant bands out: forgotten ids re-enter as new, stale pairs skipped") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BandDoc]
    // NOTE processAllAvailable is unusable under ProcessingTimeTimeout:
    // FlatMapGroupsWithStateExec.shouldRunAnotherBatch is unconditionally
    // true for it, so the stream busy-loops no-data batches (that is HOW
    // dormant-group timeouts fire without input) and "all available" is
    // never quiescent. Poll the sink / state-store metrics instead.
    def await(what: String)(cond: => Boolean): Unit = {
      val t0 = System.currentTimeMillis()
      while (!cond) {
        assert(System.currentTimeMillis() - t0 < 60000, s"timed out: $what")
        Thread.sleep(50)
      }
    }
    val q = candidatePairs(mem.toDS(),
        timeout = GroupStateTimeout.ProcessingTimeTimeout, ttlMs = 1L)
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("neardup_ttl").start()
    try {
      mem.addData(BandDoc(0, "k1", 1L), BandDoc(0, "k1", 2L))
      await("first pair")(spark.table("neardup_ttl").count() == 1)
      assert(spark.table("neardup_ttl").as[CandidatePair].collect().toSet ==
        Set(CandidatePair(1L, 2L)))
      // the no-data batches churn until the 1 ms TTL lapses and the
      // dormant (0,k1) state is removed
      await("state aged out")(Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption).exists(_.numRowsTotal == 0))
      // doc 1 re-enters the aged-out band as NEW: it pairs with fresh doc 3
      // but NOT with forgotten doc 2 — the documented lambda contract
      // (duplicates farther apart than the TTL belong to the batch pass)
      mem.addData(BandDoc(0, "k1", 1L), BandDoc(0, "k1", 3L))
      await("post-TTL pair")(spark.table("neardup_ttl").count() >= 2)
      val all = spark.table("neardup_ttl").as[CandidatePair].collect().toSet
      assert(all == Set(CandidatePair(1L, 2L), CandidatePair(1L, 3L)),
        s"got $all")
    } finally q.stop()
  }

  test("availableNow drain equals batch lshCandidates on real documents") {
    val drained = availableNowCandidates(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val batch = DedupOps.lshCandidates(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(drained == batch && drained.nonEmpty)
  }
}
