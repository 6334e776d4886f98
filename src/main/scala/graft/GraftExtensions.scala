package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BottomKSample, CharNgrams, DotProductScaled, HistQuantile, HllDistinct, MinHashAgg, MisraGries, TopKAgg, WordShingles}

/** Session extension registering graft's native Catalyst expressions as
  * SQL functions, so the pure-SQL surface (`spark.sql`, thrift/connect
  * clients, the reference's dbt-style SQL users) can call them without
  * touching the Scala Column API:
  *
  *  - `dot_product_scaled(a, b, scale)` — exact scaled-integer dot
  *    product (codegen'd loop; [[graft.functions.DotProductScaled]])
  *  - `word_shingles(text, n[, distinct])` — native word n-gram
  *    shingling ([[graft.functions.WordShingles]])
  *  - `sorted_intersect_count(a, b)` — |A ∩ B| of two sorted BIGINT
  *    arrays as a codegen'd two-pointer merge
  *    ([[graft.functions.SortedIntersectCount]]; the triangle-closure
  *    primitive)
  *  - `minhash_sig(shingle, k)` — mergeable MinHash sketch aggregate
  *    ([[graft.functions.MinHashAgg]])
  *  - `misra_gries(item, capacity)` — bounded-state heavy-hitters
  *    aggregate ([[graft.functions.MisraGries]])
  *  - `hll_distinct(value)` — deterministic md5-based HyperLogLog
  *    approx-distinct ([[graft.functions.HllDistinct]]; caller casts the
  *    value to string to fix the hashed representation)
  *  - `hll_sketch(value)` / `hll_merge_estimate(sketch)` — the stored
  *    sketch-table split: emit the 256-byte register array / merge
  *    stored arrays and estimate ([[graft.ext.Sketches]])
  *  - `bottom_k_sample(tag, value, k)` — mergeable uniform sample of
  *    the k smallest-tagged rows ([[graft.functions.BottomKSample]])
  *  - `hist_quantiles(v, lo, width, buckets, percents_csv)` —
  *    constant-state histogram quantile sketch, one array entry per
  *    percent in the comma-separated literal
  *    ([[graft.functions.HistQuantile]])
  *  - `top_k(score, id, k)` — bounded-state grouped top-k by
  *    (score desc, id asc) ([[graft.functions.TopKAgg]])
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (a STATIC conf — it must be set before the SparkContext exists, i.e.
  * at spark-submit/first-session time; on an already-running context use
  * `SparkSession.builder().withExtensions(new GraftExtensions)` instead).
  * This is the standard `SparkSessionExtensions` injection point (the
  * same mechanism Delta/Iceberg use), chosen over `spark.udf.register`
  * because these are Catalyst expressions: they keep codegen, constant
  * folding, and null-propagation instead of opaque UDF dispatch.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit[T](e: Expression, what: String): T = {
    require(e.foldable, s"$what must be a literal, got: $e")
    e.eval().asInstanceOf[T]
  }
  private def intLit(e: Expression, what: String): Int =
    lit[Number](e, what).intValue
  private def longLit(e: Expression, what: String): Long =
    lit[Number](e, what).longValue

  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator physical planning: the native as-of join
    // (graft.plans.AsOfJoin -> AsOfJoinExec streaming merge)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_product_scaled"),
      info(classOf[DotProductScaled], "dot_product_scaled"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "dot_product_scaled(arrayA, arrayB, scale)")
        DotProductScaled(args(0), args(1), longLit(args(2), "scale"))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info(classOf[WordShingles], "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "word_shingles(text, n[, distinct])")
        val distinct = args.length == 3 && lit[Boolean](args(2), "distinct")
        WordShingles(args(0), intLit(args(1), "n"), distinct)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      info(classOf[CharNgrams], "char_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "char_ngrams(text, n)")
        CharNgrams(args(0), intLit(args(1), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info(classOf[graft.functions.SortedIntersectCount], "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(sortedA, sortedB)")
        graft.functions.SortedIntersectCount(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashAgg], "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(shingle, k)")
        MinHashAgg(args(0), intLit(args(1), "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info(classOf[MisraGries], "misra_gries"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "misra_gries(item, capacity)")
        MisraGries(args(0), intLit(args(1), "capacity"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_distinct"),
      info(classOf[HllDistinct], "hll_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hll_distinct(value)")
        // cast like the Column helper: the sketch hashes the base-10/utf8
        // string rendering, whatever the input type
        HllDistinct(org.apache.spark.sql.catalyst.expressions.Cast(
          args(0), org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_sketch"),
      info(classOf[graft.functions.HllSketch], "hll_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hll_sketch(value)")
        graft.functions.HllSketch(org.apache.spark.sql.catalyst.expressions.Cast(
          args(0), org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_merge_estimate"),
      info(classOf[graft.functions.HllMergeEstimate], "hll_merge_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hll_merge_estimate(sketch_binary)")
        graft.functions.HllMergeEstimate(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_merge_sketch"),
      info(classOf[graft.functions.HllMergeSketch], "hll_merge_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hll_merge_sketch(sketch_binary)")
        graft.functions.HllMergeSketch(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("bottom_k_sample"),
      info(classOf[BottomKSample], "bottom_k_sample"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "bottom_k_sample(tag, value, k)")
        BottomKSample(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(0), org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(1), org.apache.spark.sql.types.DoubleType),
          intLit(args(2), "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hist_quantiles"),
      info(classOf[HistQuantile], "hist_quantiles"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "hist_quantiles(v, lo, width, buckets, percents_csv)")
        val percents = lit[Any](args(4), "percents_csv").toString
          .split(",").map(_.trim.toInt).toSeq
        HistQuantile(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(0), org.apache.spark.sql.types.LongType),
          longLit(args(1), "lo"), longLit(args(2), "width"),
          intLit(args(3), "buckets"), percents)
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k"),
      info(classOf[TopKAgg], "top_k"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "top_k(score, id, k)")
        TopKAgg(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(0), org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            args(1), org.apache.spark.sql.types.LongType),
          intLit(args(2), "k"))
      }))
    // optimizer rule: the composable aggregate(zip_with(...)) dot-product
    // spelling rewrites to the codegen'd native expression
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}
