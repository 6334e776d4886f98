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
