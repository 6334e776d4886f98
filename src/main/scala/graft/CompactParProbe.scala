package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Compact

/** Prices [[Compact.compactPartitioned]]'s per-leaf parallelism (r14
  * VERDICT #4): the serial loop paid one Spark job per leaf
  * SEQUENTIALLY — at 10k-partition lakes that is 10k job latencies in
  * a row, wall-clock the SUM of leaves. With a bounded submission pool
  * the jobs overlap and wall-clock should track max-leaf-time x
  * ceil(leaves / pool) plus scheduling overhead.
  *
  * Method: hive-partition an events copy into `leaves` leaf dirs of 8
  * small files each, then compact the whole root serially
  * (parallelism = 1) and with the default pool (8), rebuilding the
  * layout between runs; also time ONE leaf alone (the max-leaf floor a
  * perfectly overlapped pass cannot beat). Emits one JSON line.
  *
  * Usage: graft.CompactParProbe [sfDir] [workDir] [leaves]
  */
object CompactParProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/compact_par_probe")
    val leaves = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = s"$work/events_hive"
    def rebuild(): Unit =
      Tables.events(spark, sfDir)
        .withColumn("p", pmod(hash(col("event_id")), lit(leaves)))
        .repartition(8)
        .write.mode("overwrite").partitionBy("p").parquet(root)
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    rebuild()
    // the floor: one leaf alone (what a perfectly overlapped pass pays
    // per pool-slot round)
    val oneLeaf = timed {
      Compact.compactDir(spark, s"$root/p=0", targetBytes = 1L << 30)
    }
    rebuild()
    val serial = timed {
      Compact.compactPartitioned(spark, root, targetBytes = 1L << 30,
        parallelism = 1)
    }
    rebuild()
    val par = timed {
      Compact.compactPartitioned(spark, root, targetBytes = 1L << 30,
        parallelism = Compact.DefaultLeafParallelism)
    }
    println(
      s"""{"probe":"compact_partitioned_parallelism","sf":"${sfDir.split('/').last}",""" +
      s""""leaves":$leaves,"files_per_leaf":8,"one_leaf_s":${f"$oneLeaf%.2f"},""" +
      s""""serial_s":${f"$serial%.2f"},"par${Compact.DefaultLeafParallelism}_s":${f"$par%.2f"},""" +
      s""""speedup":${f"${serial / par}%.2f"}}""")
    spark.stop()
  }
}
