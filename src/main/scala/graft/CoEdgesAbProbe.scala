package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the co-occurrence derivation (r16 optimization round):
  * the shared prefix of every graph-family query.
  *
  * A: the shipped spelling — `distinct()` then an unconstrained
  *    self-join (the planner broadcasts one side, so the incidence
  *    distinct computes TWICE: once for the stream side, once under the
  *    BroadcastExchange — see plans/r16/x_graph_degrees_before.txt).
  * B: one hash(k) exchange up front (`repartition(col("k"))`); the
  *    distinct and the self-join then inherit the layout (zero further
  *    exchanges before the pair-distinct), with SHUFFLE_HASH pinning the
  *    join away from a broadcast that would re-derive the distinct.
  *
  * Prints min-of-N seconds per variant at the given sf dir, plus the
  * exchange counts from the executed plans.
  */
object CoEdgesAbProbe {

  def variantA(df: DataFrame): DataFrame = {
    val pairs = df.select(col("l_orderkey").as("k"), col("l_partkey").as("i")).distinct()
    pairs.join(pairs.withColumnRenamed("i", "j"), "k")
      .where(col("i") < col("j"))
      .select(col("i").as("u"), col("j").as("v"))
      .distinct()
  }

  def variantB(df: DataFrame): DataFrame = {
    val pairs = df.select(col("l_orderkey").as("k"), col("l_partkey").as("i"))
      .repartition(col("k")).distinct()
    pairs.join(pairs.withColumnRenamed("i", "j").hint("SHUFFLE_HASH"), "k")
      .where(col("i") < col("j"))
      .select(col("i").as("u"), col("j").as("v"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, sfDir, "lineitem")
    li.count() // warm the scan
    def time(tag: String, mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val d = mk
        d.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    time("A_coedges          ", variantA(li))
    time("B_coedges_copart   ", variantB(li))
    time("A_degrees          ", graft.ext.Graph.degrees(variantA(li)))
    time("B_degrees          ", graft.ext.Graph.degrees(variantB(li)))
    // weighted backbone twin
    def wA = {
      val pairs = li.select(col("l_orderkey").as("k"), col("l_partkey").as("i")).distinct()
      pairs.join(pairs.withColumnRenamed("i", "j"), "k")
        .where(col("i") < col("j"))
        .groupBy(col("i").as("u"), col("j").as("v")).agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
    }
    def wB = {
      val pairs = li.select(col("l_orderkey").as("k"), col("l_partkey").as("i"))
        .repartition(col("k")).distinct()
      pairs.join(pairs.withColumnRenamed("i", "j").hint("SHUFFLE_HASH"), "k")
        .where(col("i") < col("j"))
        .groupBy(col("i").as("u"), col("j").as("v")).agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
    }
    time("A_weighted_backbone", wA)
    time("B_weighted_backbone", wB)
    spark.stop()
  }
}
