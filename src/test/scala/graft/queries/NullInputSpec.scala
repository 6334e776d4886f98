package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** NULL-injection robustness: every registered query must execute when
  * a slice of the corpus has NULL text/lang/source/embedding/label —
  * the shape a permissive ingest (corrupt-record columns, optional
  * fields) hands every downstream operator. Found one real bug: the LSH
  * width guard raised on NULL embeddings instead of excluding them.
  * Null rows may legitimately change RESULTS (null-propagation and
  * never-matching join keys are the SQL contract); they must never
  * crash the plan.
  */
class NullInputSpec extends SparkSuite {

  test("every registered query executes with nulls injected into optional fields") {
    val out = Files.createTempDirectory("graft_null_sf").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text", when(col("doc_id") % 10 === 0, lit(null)).otherwise(col("text")))
      .withColumn("lang", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("lang")))
      .withColumn("source", when(col("doc_id") % 13 === 0, lit(null)).otherwise(col("source")))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("embedding", when(col("vec_id") % 10 === 0, lit(null)).otherwise(col("embedding")))
      .withColumn("label", when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("label")))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, out).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
    }
    assert(failures.isEmpty, s"queries failing on null-injected input:\n${failures.mkString("\n")}")
  }
}
