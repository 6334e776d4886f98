package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× media-volume probe for the MJPEG-AVI frame pipeline (r7 VERDICT
  * stretch #8): the synth→container-walk→JPEG-decode chain runs inside
  * `mapPartitions`, so scaling the file count should scale near-
  * linearly in wall-clock until the cores saturate — prove it the way
  * the image/audio SCALE.md rows do instead of claiming it.
  *
  * Usage: AviScaleProbe <sfDir> [cores=32] [reps=3]
  */
object AviScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Tables.documents(spark, dir).count()

    def run(nFiles: Int): (Double, Long) = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // the x_avi_frames pipeline, file count parameterized; ids are
        // synthesized so the probe isn't bounded by the docs table size
        val media = spark.range(nFiles.toLong)
          // one task per ~32 files: the decode is the work, keep all
          // cores busy even at small counts
          .repartition(math.max(cores, nFiles / 32))
          .as[Long]
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.map { id =>
              val avi = ext.Multimodal.synthMjpegAvi(id)
              ext.Multimodal.MediaFile(id, "video", avi,
                ext.Multimodal.MediaMeta(s"v_$id.avi", "video/x-msvideo",
                  avi.length.toLong))
            }
          }
        val n = ext.Multimodal.sampleFrames(media, frameSize = 1024, stride = 1)
          .toDF()
          .select(col("media_id"), col("frame_idx").cast("bigint").as("frame_idx"),
            col("frame_bytes"))
          .as[(Long, Long, Array[Byte])]
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.map { case (id, idx, png) =>
              val (w, h, _, _) = ext.Multimodal.decodeImage(png)
              (id, idx, w.toLong, h.toLong)
            }
          }.toDF("media_id", "frame_idx", "width", "height")
          .count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (times.map(_._1).min, times.head._2)
    }

    val (t1x, f1x) = run(100)
    val (t10x, f10x) = run(1000)
    val (t100x, f100x) = run(10000)
    println(f"[avi-scale] 1x: 100 files / $f1x frames in $t1x%5.2f s; " +
      f"10x: 1000 files / $f10x frames in $t10x%5.2f s (${t10x / t1x}%4.2f x); " +
      f"100x: 10000 files / $f100x frames in $t100x%5.2f s (${t100x / t1x}%4.2f x)")
    spark.stop()
  }
}
