package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Contract of the stored band index ([[DedupOps.writeBandIndex]] /
  * [[DedupOps.lshCandidatesStored]]): result-identical to the
  * in-memory incremental probe, and the corpus side of the candidate
  * join reads the bucket layout with no exchange — the amortization
  * the stored index exists to deliver.
  */
class DedupStoredSpec extends SparkSuite {
  import spark.implicits._

  private def corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),
    (3L, "completely different text about spark catalyst optimizer rules here"),
    (4L, "yet another unrelated document mentioning parquet column pruning")
  ).toDF("doc_id", "text")

  private def freshDocs = Seq(
    (101L, "the quick brown fox jumps over the lazy dog again and again"),
    (102L, "nothing in common with anything stored in the corpus index")
  ).toDF("doc_id", "text")

  test("stored probe returns exactly the in-memory incremental candidates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_band_spec").toString
    DedupOps.writeBandIndex(corpusDocs, "doc_id", "text",
      "graft_bands_spec", s"$dir/bands", buckets = 4)
    val stored = DedupOps.lshCandidatesStored(spark, "graft_bands_spec",
      freshDocs, "doc_id", "text").as[(Long, Long)].collect().toSet
    val inMem = DedupOps.lshCandidatesIncremental(
      DedupOps.minhashSignatures(corpusDocs, "doc_id", "text"),
      freshDocs, "doc_id", "text").as[(Long, Long)].collect().toSet
    assert(stored == inMem, s"stored=$stored inMem=$inMem")
    // the near-dup must actually be found (non-vacuous fixture)
    assert(stored.contains((101L, 1L)))
    spark.sql("DROP TABLE IF EXISTS graft_bands_spec")
  }

  test("corpus side of the stored probe joins off the bucket layout — no exchange, no sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft_band_spec2").toString
    DedupOps.writeBandIndex(corpusDocs, "doc_id", "text",
      "graft_bands_spec2", s"$dir/bands", buckets = 4)
    val probe = DedupOps.lshCandidatesStored(spark, "graft_bands_spec2",
      freshDocs, "doc_id", "text")
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    // the bucketed scan feeds the join directly: every Exchange in the
    // plan must be above/beside the FRESH side or the distinct — none
    // may sit between the catalog scan and the join. The scan line
    // itself advertises the bucket count.
    assert(plan.contains("Bucketed: true"),
      s"corpus scan did not use the bucket layout:\n$plan")
    spark.sql("DROP TABLE IF EXISTS graft_bands_spec2")
  }
}
