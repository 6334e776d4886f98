package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodeHeaderStub` parses a deterministic fake format (12-byte
  * header of 3 big-endian ints: width, height, channels; payload =
  * pixel/sample bytes). Everything around it is the real Spark plumbing a
  * production pipeline needs and is tested: the (content binary, meta
  * struct) schema, `mapPartitions` batch shape (one decoder init per
  * partition, the expensive part with a real codec), partitioning
  * guidance, and deterministic downstream features.
  *
  * Scale design: binary payloads dominate row size ⇒ repartition by a
  * size-balanced key before decode (`repartitionForDecode`), never
  * groupBy raw bytes, and keep features (small) separate from content
  * (huge) so downstream joins move kilobytes not terabytes.
  */
object Multimodal {

  case class MediaMeta(filename: String, mime: String, size_bytes: Long)
  case class MediaFile(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class ImageFeatures(media_id: Long, width: Int, height: Int, channels: Int,
                           mean_intensity: Double, content_hash: String)
  case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB decode (see object doc): header → (width, height, channels).
    * A real implementation would hand `bytes` to an image codec here;
    * the signature and call-site shape would not change.
    */
  def decodeHeaderStub(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 12, s"media payload too short: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes)
    (bb.getInt(0), bb.getInt(4), bb.getInt(8))
  }

  /** Wrap raw binaries + metadata into the canonical media schema. */
  def asMediaTable(spark: SparkSession, rows: Seq[MediaFile]): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  /** Balance decode work across executors: hash-repartition on the id so
    * a few huge files can't skew one partition (at real scale: salt by
    * size bucket).
    */
  def repartitionForDecode(ds: Dataset[MediaFile], partitions: Int): Dataset[MediaFile] =
    ds.repartition(partitions, col("media_id"))

  /** Decode + feature-extract, one partition at a time (`mapPartitions`
    * so a real codec would be initialized once per partition, not per
    * row). Features are deterministic: mean payload byte intensity +
    * md5 content hash.
    */
  def imageFeatures(ds: Dataset[MediaFile]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
      it.map { m =>
        val (w, h, c) = decodeHeaderStub(m.content)
        val payload = m.content.drop(12)
        val mean =
          if (payload.isEmpty) 0.0
          else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
        md.reset()
        val hash = md.digest(m.content).map("%02x".format(_)).mkString
        ImageFeatures(m.media_id, w, h, c, mean, hash)
      }
    }
  }

  /** Frame sampling for video-kind payloads: every `stride`-th
    * `frameSize`-byte slice of the payload becomes a frame row —
    * the explode-shaped stage a real video pipeline has.
    */
  def sampleFrames(ds: Dataset[MediaFile], frameSize: Int, stride: Int): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      val payload = m.content.drop(12)
      payload.grouped(frameSize).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 => FrameSample(m.media_id, idx, frame)
      }
    }
  }

  /** Features table joined back to metadata — the small, joinable output
    * surface; the binary column is deliberately dropped.
    */
  def featureTable(ds: Dataset[MediaFile]): DataFrame =
    imageFeatures(ds).toDF()
      .join(ds.toDF().select(col("media_id"), col("kind"), col("meta.*")), "media_id")
}
