package graft.functions

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

import graft.SparkSuite

class WordShinglesSpec extends SparkSuite {
  import spark.implicits._

  /** Independent built-ins-only reference implementation, kept HERE (not
    * in TextOps, which delegates to the native expression — the HOF form
    * is ~25× slower per row, ProfileScale): transform over positions,
    * element_at into the split. Exists purely so the native expression
    * is cross-checked against a formulation that shares none of its code.
    */
  private def hofShingles(c: Column, n: Int): Column = {
    val toks = F.split(c, " ")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  test("native shingles match the HOF formulation on real corpus text") {
    val docs = graft.Tables.documents(spark, sfDir)
    val cmp = docs.select(
      WordShingles.shingles(col("text"), 3).as("native"),
      hofShingles(col("text"), 3).as("hof"),
      WordShingles.shingles(col("text"), 3, distinct = true).as("native_distinct"),
      array_distinct(hofShingles(col("text"), 3)).as("hof_distinct"))
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
