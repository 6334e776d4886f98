package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round plan capture: writes `explain formatted` for the
  * named queries to `plans/<tag>/<query>_<suffix>.txt` — the
  * before/after evidence files the optimization rounds commit
  * (OPTIMIZATION_r16.md). Plan-only mode, like [[DumpPlans]], so
  * checkpoint-backed queries show their full derivation.
  *
  *   sbt "runMain graft.DumpPlansR16 before q1,q2,..."   (tag r16)
  */
object DumpPlansR16 {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.planOnly", "true")
    val suffix = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq.empty)
    val tag = args.lift(2).getOrElse("r16")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), p + "\n")
      println(s"wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
