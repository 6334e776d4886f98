package graft.functions

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSuite

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Bit-by-bit reference interleave (a → even bits, b → odd bits). */
  private def morton(a: Long, b: Long): Long =
    (0 until 31).map { k =>
      (((a >> k) & 1L) << (2 * k)) | (((b >> k) & 1L) << (2 * k + 1))
    }.reduce(_ | _)

  test("zValue matches the bit-by-bit reference interleave") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (0x7FFFFFFFL, 0L), (999983L, 424242L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b").as("z")).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => morton(a, b) })
    assert(got.forall(_ >= 0L)) // 31-bit inputs never reach the sign bit
  }

  private def rowGroupSpans(dir: String, name: String): Seq[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.toString), conf))
      try r.getFooter.getBlocks.asScala.toSeq.map { blk =>
        val s = blk.getColumns.asScala.find(_.getPath.toDotString == name).get.getStatistics
        s.genericGetMax.asInstanceOf[java.lang.Long].longValue -
          s.genericGetMin.asInstanceOf[java.lang.Long].longValue
      } finally r.close()
    }
  }

  test("z-order clustering tightens row-group stats on BOTH dimensions") {
    val tmp = Files.createTempDirectory("graft_zorder").toString
    // 200×200 grid of (a, b), hash-shuffled like real shuffle output
    val df = spark.range(40000)
      .select(($"id" % 200).as("a"), expr("(id div 200) % 200").as("b"),
        concat(lit("pad-"), $"id").as("pad"))
      .orderBy(xxhash64($"id"))
    def write(d: org.apache.spark.sql.DataFrame, path: String): Unit =
      d.coalesce(1).write.option("parquet.block.size", s"${64 * 1024}")
        .mode("overwrite").parquet(path)

    write(df.coalesce(1).sortWithinPartitions("a"), s"$tmp/bya")
    write(ZOrder.clusterBy2(df.coalesce(1), $"a", $"b"), s"$tmp/z")

    def avg(xs: Seq[Long]) = xs.sum.toDouble / xs.size
    // single-dim sort: b spans ~the full 0..199 range in every row group
    assert(avg(rowGroupSpans(s"$tmp/bya", "b")) > 150.0)
    // z-order: BOTH dims' average spans are a fraction of the full range
    val za = avg(rowGroupSpans(s"$tmp/z", "a"))
    val zb = avg(rowGroupSpans(s"$tmp/z", "b"))
    assert(za < 100.0 && zb < 100.0, s"z spans a=$za b=$zb")
  }
}
