package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ext.{Corpus, DedupOps}

class BloomMightContainSpec extends SparkSuite {
  import spark.implicits._

  test("no false negatives: every inserted value passes the probe") {
    val vals = (0 until 5000).map(i => s"shingle value number $i")
    val df = vals.toDF("s")
    val bloom = df.stat.bloomFilter("s", 5000, 0.01)
    val kept = df.filter(BloomMightContain.mightContain($"s", bloom)).count()
    assert(kept == 5000) // a bloom filter may over-accept, never under
  }

  test("false-positive rate is near the configured fpp; NULL probes stay NULL") {
    val bloom = (0 until 5000).map(i => s"member $i").toDF("s")
      .stat.bloomFilter("s", 5000, 0.01)
    val outside = (0 until 5000).map(i => s"stranger $i").toDF("s")
    val fp = outside.filter(BloomMightContain.mightContain($"s", bloom)).count()
    assert(fp <= 5000 * 0.05, s"$fp false positives — far above 1% fpp")
    val nulls = Seq[Option[String]](None, Some("member 1")).toDF("s")
      .select(BloomMightContain.mightContain($"s", bloom).as("m"))
      .as[Option[Boolean]].collect().toSet
    assert(nulls == Set(None, Some(true)))
  }

  test("probe runs inside whole-stage codegen, and codegen agrees with eval") {
    val bloom = (0 until 100).map(i => s"m $i").toDF("s").stat.bloomFilter("s", 100, 0.01)
    // range source, not a local Seq: ConvertToLocalRelation would fold a
    // LocalRelation filter at OPTIMIZATION time (interpreted eval) and no
    // codegen stage would exist to test
    val src = spark.range(200).select(
      concat(when($"id" < 100, lit("m ")).otherwise(lit("x ")),
        ($"id" % 100).cast("string")).as("s"))
    val df = src.filter(BloomMightContain.mightContain($"s", bloom))
    val plan = df.queryExecution.executedPlan.toString
    // the filter must sit inside a codegen stage (*(n) prefix), not fall
    // back to interpreted eval on the scan hot path
    assert(plan.contains("bloom_might_contain") && plan.contains("*(1)"))
    val viaCodegen = df.count()
    val viaEval = src.as[String].collect().count(s => bloom.mightContainString(s))
    assert(viaCodegen == viaEval && viaCodegen >= 100)
  }

  test("bloom-prefiltered contamination is exact: equals the bloom-free join") {
    val docs = graft.Tables.documents(spark, sfDir)
    val withB = Corpus.assignSplit(docs, "doc_id")
    val train = withB.filter($"bucket" < 204)
    val eval = withB.filter($"bucket" >= 230)
    val got = Corpus.contaminatedTrainDocs(train, eval, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toSet
    val exact = DedupOps.shingleIndex(train, "doc_id", "text", 3)
      .join(DedupOps.shingleIndex(eval, "doc_id", "text", 3)
        .select($"shingle").distinct(), Seq("shingle"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    assert(got == exact && got.nonEmpty)
  }
}
