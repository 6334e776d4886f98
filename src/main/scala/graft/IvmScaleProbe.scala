package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

/** Incremental-aggregate-maintenance probe (SCALE.md): the claim is
  * that merging a FIXED-SIZE delta into standing aggregate state costs
  * O(delta + |keys|) regardless of history size — vs the full
  * recompute's O(history). The history comes from <sfDir>; the delta is
  * ALWAYS the md5-bucket tail of <deltaDir> (default: the history dir),
  * so runs at growing history scales with a pinned deltaDir measure
  * exactly the flat-merge / growing-recompute split.
  * Usage: IvmScaleProbe <sfDir> [deltaDir=<sfDir>]
  */
object IvmScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val deltaSrc = if (args.length > 1) args(1) else sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivmprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }
    val keys = Seq("event_type", "hr")
    def factsOf(dir: String) = Tables.events(spark, dir).select(
      col("event_type"), date_trunc("hour", col("ts")).as("hr"),
      floor(col("value") * 100).cast("long").as("v"),
      graft.ext.Corpus.splitBucket("event_id").as("bucket"))
    val facts = factsOf(sfDir)
    println(s"[ivmprobe] history: ${facts.count()} rows")
    val work = java.nio.file.Files.createTempDirectory("ivm_probe").toString
    val state = s"$work/state"
    val deltaDir = s"$work/delta"
    time("state build (history, once)")(
      IncrementalAgg.partials(facts, keys, "v")
        .write.mode("overwrite").parquet(state))
    // the delta lands as its own files (a day's partition in production)
    // — the merge must never pay a history-sized scan to find it
    factsOf(deltaSrc).filter(col("bucket") >= 250)
      .write.mode("overwrite").parquet(deltaDir)
    println(s"[ivmprobe] delta: ${spark.read.parquet(deltaDir).count()} rows")
    time("full recompute (history+delta)")(
      IncrementalAgg.partials(
          facts.unionByName(spark.read.parquet(deltaDir)), keys, "v")
        .write.format("noop").mode("overwrite").save())
    time("delta merge (state+delta)")(
      IncrementalAgg.mergeDeltaSmall(spark.read.parquet(state),
          IncrementalAgg.partials(spark.read.parquet(deltaDir), keys, "v"),
          keys)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
