package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ext.TextOps

class WordShinglesSpec extends SparkSuite {
  import spark.implicits._

  test("native shingles match the HOF formulation on real corpus text") {
    val docs = graft.Tables.documents(spark, sfDir)
    val cmp = docs.select(
      WordShingles.shingles(col("text"), 3).as("native"),
      TextOps.shingles(col("text"), 3).as("hof"),
      WordShingles.shingles(col("text"), 3, distinct = true).as("native_distinct"),
      array_distinct(TextOps.shingles(col("text"), 3)).as("hof_distinct"))
    cmp.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[String](2) == r.getSeq[String](3))
    }
  }

  test("edge cases: short text, empty tokens, n=2") {
    val r = Seq("a b", "a  b c", "x").toDF("t").select(
      WordShingles.shingles(col("t"), 2).as("s2"),
      WordShingles.shingles(col("t"), 3).as("s3")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b"))
    assert(r(0).getSeq[String](1).isEmpty)
    assert(r(1).getSeq[String](1) == Seq("a  b", " b c")) // empty token preserved
    assert(r(2).getSeq[String](0).isEmpty)
  }
}
