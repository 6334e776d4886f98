package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Numeric

/** Embedding similarity search: brute-force cosine top-k (baseline) and
  * bucket-pruned top-k (the scale path).
  *
  * Numerics: dot products and norms are computed as exact scaled
  * integers — each elementwise product is snapped to an integer multiple
  * of 10^-12 (exact IEEE ops) and summed as int64, so the result is
  * independent of summation order, engine, and partitioning. The final
  * cosine is a handful of deterministic IEEE ops (sqrt is
  * correctly-rounded everywhere).
  *
  * Scale design: queries are broadcast (small side); the corpus is never
  * shuffled — brute force is one scan of the corpus, and the bucketed
  * variant is a hash join on the bucket id that prunes the scan to
  * matching buckets (the IVF pattern: at 100 TB, bucket = centroid cell
  * from an offline k-means, stored as a partition column so bucket
  * pruning happens at the parquet scan; here the testdata `label` column
  * plays that role). Top-k is a per-query window over the tiny scored set.
  */
object Similarity {

  val Scale = 1000000000000L // 1e12: |v| ≤ ~0.6 ⇒ per-term ≤ 3.6e11, 64-dim sums ≪ 2^53

  /** Exact scaled-integer dot product of two float-array columns — the
    * custom codegen'd Catalyst expression ([[graft.functions.DotProductScaled]]);
    * the equivalent `aggregate(zip_with(...))` formulation is interpreted
    * (higher-order functions don't codegen) and ~an order of magnitude
    * slower in the ANN hot loop.
    */
  def dotScaled(a: Column, b: Column): Column =
    graft.functions.DotProductScaled.dotScaled(a, b, Scale)

  /** The composable built-ins-only formulation, kept as a semantics
    * cross-check for the custom expression (tested equal).
    */
  def dotScaledHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => floor(x.cast("double") * y.cast("double") * lit(Scale) + lit(0.5))),
      lit(0L), (acc, x) => acc + x)

  /** Squared-norm of a vector, same scaled-integer scheme. */
  def norm2Scaled(a: Column): Column = dotScaled(a, a)

  /** Cosine from scaled dot + scaled squared-norms, rounded to 6 decimals
    * order-independently.
    */
  def cosineFromScaled(dotS: Column, n2a: Column, n2b: Column): Column =
    Numeric.roundBin(
      (dotS.cast("double") / lit(Scale)) /
        (sqrt(n2a.cast("double") / lit(Scale)) * sqrt(n2b.cast("double") / lit(Scale))), 6)

  private def topK(scored: DataFrame, k: Int, outCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(outCols.map(col): _*)
  }

  /** Brute-force cosine top-k: every query (broadcast) against every
    * corpus row — one corpus scan, no shuffle until the tiny top-k window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm2Scaled(col(vecCol)).as("c_n2"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm2Scaled(col(vecCol)).as("q_n2"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        cosineFromScaled(dotScaled(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")))
    topK(scored, k, Seq("query_id", "neighbor_id", "cos_sim"))
  }

  /** Bucket-pruned top-k (IVF shape): candidates limited to corpus rows
    * in the query's bucket — an equi-join on the bucket id instead of a
    * cross product.
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, bucketCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm2Scaled(col(vecCol)).as("c_n2"), col(bucketCol).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm2Scaled(col(vecCol)).as("q_n2"), col(bucketCol).as("q_bucket"))
    val scored = c.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        cosineFromScaled(dotScaled(col("q_vec"), col("c_vec")), col("q_n2"), col("c_n2")))
    topK(scored, k, Seq("query_id", "neighbor_id", "bucket", "cos_sim"))
  }
}
