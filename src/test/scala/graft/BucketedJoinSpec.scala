package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the third leg of the join-at-scale
  * strategy (broadcast for small dims, AQE skew handling, BUCKETING for
  * repeated big-big joins): two tables bucketed on the join key join
  * with ZERO exchanges, because bucket layout IS the required hash
  * partitioning. At 100 TB this turns every fact-fact join on a shared
  * key (orders⋈customer, events⋈events) from a full dual shuffle into a
  * local per-bucket merge; the write-side cost is paid once.
  */
class BucketedJoinSpec extends SparkSuite {

  test("tables bucketed on the join key sort-merge-join with zero exchanges") {
    val db = "graft_bucket_spec"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables(spark, sfDir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(s"$db.b_orders")
      Tables(spark, sfDir, "customer")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(s"$db.b_customer")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val joined = spark.table(s"$db.b_orders")
          .join(spark.table(s"$db.b_customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$plan")
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"scan is not bucket-aware:\n$plan")

        // same result as the plain (shuffling) join
        val plain = Tables(spark, sfDir, "orders")
          .join(Tables(spark, sfDir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"))
        assert(joined.count() == plain.count())
        assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
