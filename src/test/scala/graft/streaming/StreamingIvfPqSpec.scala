package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.ext.Similarity

/** The t14 contract: a stream-maintained IVF-PQ code table (per-batch
  * residual encode against the standing model into `batch=` shards)
  * probes identically to the from-scratch [[Similarity.writeIvfPqIndex]]
  * build — for any micro-batch split, under replay, and across shard
  * consolidation.
  */
class StreamingIvfPqSpec extends SparkSuite {

  private def emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
  private def queries = emb.filter(col("vec_id") < 10)

  test("drained streaming codes probe equals the batch stored-index search") {
    val drained = Similarity.availableNowIvfPq(spark, sfDir, compact = false)
      .collect().map(_.toString).toSeq
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec_batch").toString
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding",
      nCoarse = 4, coarseIters = 2, m = 4, subDim = 16, ks = 4,
      pqIters = 2, path = path)
    val batch = Similarity.ivfPqTopKStored(spark, path, queries,
        "vec_id", "embedding", m = 4, subDim = 16, nProbe = 2, k = 3)
      .collect().map(_.toString).toSeq
    assert(drained == batch && drained.nonEmpty) // ordered top-k: exact list
  }

  test("hand-fed shards: maintained codes == from-scratch build for any split; replay is a no-op") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    Similarity.writeIvfPqModel(emb, "vec_id", "embedding", nCoarse = 4,
      coarseIters = 2, m = 4, subDim = 16, ks = 4, pqIters = 2, path = idx)
    val sink = Similarity.ivfPqSink(idx, "vec_id", "embedding", m = 4, subDim = 16) _
    sink(emb.filter(col("vec_id") % 2 === 0).toDF(), 0L)
    sink(emb.filter(col("vec_id") % 2 =!= 0).toDF(), 1L)
    def probe() = Similarity.ivfPqTopKStreamed(spark, idx, queries,
        "vec_id", "embedding", m = 4, subDim = 16, nProbe = 2, k = 3)
      .collect().map(_.toString).toSeq
    val got = probe()
    // one-shot maintained index over the full corpus — same model, one shard
    val one = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec_one").toString
    Similarity.writeIvfPqModel(emb, "vec_id", "embedding", nCoarse = 4,
      coarseIters = 2, m = 4, subDim = 16, ks = 4, pqIters = 2, path = one)
    Similarity.ivfPqSink(one, "vec_id", "embedding", m = 4, subDim = 16)(emb.toDF(), 0L)
    val want = Similarity.ivfPqTopKStreamed(spark, one, queries,
        "vec_id", "embedding", m = 4, subDim = 16, nProbe = 2, k = 3)
      .collect().map(_.toString).toSeq
    assert(got == want && want.nonEmpty)
    // replayed batch overwrites its own shard bit-for-bit
    sink(emb.filter(col("vec_id") % 2 =!= 0).toDF(), 1L)
    assert(probe() == want)
  }

  test("compacted hand-fed codes: probe parity, coarse_id pruning survives consolidation") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec_cmp").toString
    Similarity.writeIvfPqModel(emb, "vec_id", "embedding", nCoarse = 4,
      coarseIters = 2, m = 4, subDim = 16, ks = 4, pqIters = 2, path = idx)
    val sink = Similarity.ivfPqSink(idx, "vec_id", "embedding", m = 4, subDim = 16) _
    (0 until 3).foreach(b => sink(emb.filter(col("vec_id") % 3 === b).toDF(), b.toLong))
    def probe() = Similarity.ivfPqTopKStreamed(spark, idx, queries,
        "vec_id", "embedding", m = 4, subDim = 16, nProbe = 2, k = 3)
      .collect().map(_.toString).toSeq
    val want = probe()
    val rep = Similarity.compactIvfPqCodes(spark, idx)
    assert(rep.filesBefore > rep.filesAfter && rep.filesAfter > 0)
    val codes = new java.io.File(s"$idx/codes").listFiles().map(_.getName)
    assert(!codes.exists(_.startsWith("batch=")), codes.mkString(","))
    val live = codes.filter(_.startsWith("_compact_live_g"))
    assert(live.length == 1)
    // coarse_id stays a partition column INSIDE the live dir — the
    // probe's cell-pruning contract
    assert(new java.io.File(s"$idx/codes/${live.head}").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("coarse_id=")))
    assert(probe() == want && want.nonEmpty)
  }

  test("drain-tail compaction: result identical") {
    val compacted = Similarity.availableNowIvfPq(spark, sfDir, compact = true)
      .collect().map(_.toString).toSeq
    val plain = Similarity.availableNowIvfPq(spark, sfDir, compact = false)
      .collect().map(_.toString).toSeq
    assert(compacted == plain && compacted.nonEmpty)
  }
}
