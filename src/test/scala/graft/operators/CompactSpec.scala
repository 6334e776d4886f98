package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class CompactSpec extends SparkSuite {

  private def parquetFiles(dir: String): Array[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName)

  test("compactDir merges small files without changing the row set") {
    val dir = Files.createTempDirectory("compact_flat").toString
    val src = Tables.lineitem(spark, sfDir)
    src.repartition(32).write.mode("overwrite").parquet(dir)
    assert(parquetFiles(dir).length == 32)

    val wantRows = src.count()
    val wantSum = src.agg(sum("l_orderkey")).head.getLong(0)
    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum

    // target half the data per file → plan lands on exactly 2 outputs
    val rep = Compact.compactDir(spark, dir, targetBytes = bytes / 2 + 1)
    assert(rep.filesBefore == 32 && rep.filesAfter == 2)
    assert(parquetFiles(dir).length == 2)
    val after = spark.read.parquet(dir)
    assert(after.count() == wantRows)
    assert(after.agg(sum("l_orderkey")).head.getLong(0) == wantSum)
  }

  test("already-compact directory is a no-op") {
    val dir = Files.createTempDirectory("compact_noop").toString
    Tables.nation(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(dir)
    val before = parquetFiles(dir).toSet
    val rep = Compact.compactDir(spark, dir, targetBytes = 1L << 30)
    assert(rep.filesBefore == 1 && rep.filesAfter == 1)
    assert(parquetFiles(dir).toSet == before) // untouched, not rewritten
  }

  test("compactPartitioned compacts each hive leaf independently") {
    val root = Files.createTempDirectory("compact_part").toString
    val ev = Tables.events(spark, sfDir)
    ev.repartition(8).write.mode("overwrite")
      .partitionBy("event_type").parquet(root)

    val reports = Compact.compactPartitioned(spark, root, targetBytes = 1L << 30)
    assert(reports.nonEmpty)
    assert(reports.forall(_.filesAfter == 1))
    assert(reports.forall(r => r.filesBefore >= r.filesAfter))

    val after = spark.read.parquet(root)
    assert(after.count() == ev.count())
    // partition column round-trips; per-type counts survive the rewrite
    val want = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = after.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)

    val df = Compact.reportDf(spark, reports)
    assert(df.count() == reports.length)
  }
}
