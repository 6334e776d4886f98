package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Graph

/** One-off diagnostic: print the optimizer's sizeInBytes digit counts
  * for each intermediate of componentsIncremental, to locate the
  * BigInt stats blow-up observed in driver planning. Not registered
  * anywhere; safe to delete.
  */
object StatsProbe {
  def digits(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val t0 = System.nanoTime()
    val n = df.queryExecution.optimizedPlan.stats.sizeInBytes.toString(10).length
    println(f"STATS $name%-14s digits=$n%8d  (${(System.nanoTime() - t0) / 1e9}%.2f s)")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("stats-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")

    val wb = Graph.coOccurrenceEdgesWeighted(Tables.lineitem(spark, d), "l_orderkey", "l_partkey")
      .where(col("w") >= 2)
    val edges = wb.select(col("u"), col("v"))
    val even = edges.filter((col("u") + col("v")) % 2 === 0)
    val odd = edges.filter((col("u") + col("v")) % 2 =!= 0)
    digits(edges, "edges")
    digits(odd, "odd")

    println("running connectedComponents(even)...")
    val labels = Graph.connectedComponents(even)
    digits(labels, "labels")

    val nodes = odd.select(col("u").as("n"))
      .unionAll(odd.select(col("v").as("n"))).distinct()
    digits(nodes, "nodes")
    val lab = nodes.join(labels, Seq("n"), "left")
      .select(col("n"), coalesce(col("component"), col("n")).as("lbl"))
    digits(lab, "lab")
    val contracted = odd
      .join(lab.select(col("n").as("u"), col("lbl").as("lu")), Seq("u"))
      .join(lab.select(col("n").as("v"), col("lbl").as("lv")), Seq("v"))
      .select(col("lu").as("u"), col("lv").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    digits(contracted, "contracted")

    println("running connectedComponents(contracted)...")
    val superComp = Graph.connectedComponents(contracted)
      .select(col("n").as("component"), col("component").as("__newc"))
    digits(superComp, "superComp")

    val all = labels
      .unionByName(lab.select(col("n"), col("lbl").as("component")))
      .groupBy(col("n")).agg(min(col("component")).as("component"))
    digits(all, "all")
    val fin = all.join(superComp, Seq("component"), "left")
      .select(col("n"), coalesce(col("__newc"), col("component")).as("component"))
    digits(fin, "final")
    println("count=" + fin.count())
    spark.stop()
  }
}
