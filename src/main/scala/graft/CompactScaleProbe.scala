package graft

import java.nio.file.Files

import graft.operators.Compact

/** Timing probe for small-file compaction (SCALE.md): shatters the
  * given dir's lineitem into many small files, then times the
  * listing-sized plan + shuffle-free coalesce rewrite. The claim under
  * test is that compaction cost tracks BYTES (one read + one write),
  * not file count — the property that makes nightly compaction of a
  * 100 TB lake affordable.
  *
  * Usage: CompactScaleProbe <sfDir> [cores=16] [smallFiles=256]
  */
object CompactScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 16
    val nSmall = if (args.length > 2) args(2).toInt else 256
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")

    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[compactprobe] $n%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val li = Tables.lineitem(spark, dir)
    li.count() // warm
    val work = Files.createTempDirectory("compact_probe").toString

    time("shatter") {
      li.repartition(nSmall).write.mode("overwrite").parquet(work)
    }
    val rep = time("compact") {
      Compact.compactDir(spark, work, targetBytes = 128L << 20)
    }
    println(s"[compactprobe] files ${rep.filesBefore} -> ${rep.filesAfter}, " +
      s"bytes ${rep.bytes}")
    val n = time("verify-scan") { spark.read.parquet(work).count() }
    println(s"[compactprobe] rows $n")
    spark.stop()
  }
}
