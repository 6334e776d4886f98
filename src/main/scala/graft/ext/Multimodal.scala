package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * IMAGE decode is REAL: payloads whose magic bytes identify a JDK-decodable
  * format (PNG/JPEG/GIF/BMP) go through `javax.imageio` — width, height,
  * raster band count, and mean sample intensity come from actual pixel
  * data. AUDIO decode is REAL for PCM WAV via `javax.sound.sampled`
  * (also in the JDK): sample rate, channels, frame count, duration, and
  * mean absolute amplitude from actual samples (`audioFeatures`). VIDEO
  * frame extraction is REAL for GIF containers (`decodeGifFrames` via
  * ImageIO's multi-image reader) AND for MJPEG AVI containers
  * (`decodeAviFrames`: RIFF chunk walk to the movi LIST, each
  * `##dc`/`##db` chunk an independent JPEG through the same ImageIO
  * pixel path), and MP4-class container METADATA is a REAL ISO-BMFF box
  * parse (`parseMp4Meta`: brand, movie timescale + duration, track
  * count, track dimensions — oracle-checked end to end via the in-house
  * muxer `synthMp4`). The only remaining stub is pixel decode for
  * codec-compressed containers (H.264-class MP4/MKV — the
  * `decodeHeaderStub` fallback in `sampleFrames`), because this
  * container image ships no video codecs; the dispatch point and
  * call-site shape are exactly where an FFmpeg-style codec would slot
  * in.
  * The surrounding Spark plumbing is the production shape and is tested:
  * the (content binary, meta struct) schema, `mapPartitions` batch shape
  * (per-partition decoder setup — here `ImageIO.setUseCache(false)`, with
  * a real native codec the expensive context init), partitioning
  * guidance, and deterministic downstream features.
  *
  * Scale design: binary payloads dominate row size ⇒ repartition by a
  * size-balanced key before decode (`repartitionForDecode`), never
  * groupBy raw bytes, and keep features (small) separate from content
  * (huge) so downstream joins move kilobytes not terabytes. ImageIO's
  * default disk-backed stream cache is disabled per partition — one tmp
  * file per decode would turn a CPU-bound stage IO-bound at scale.
  */
object Multimodal {

  case class MediaMeta(filename: String, mime: String, size_bytes: Long)
  case class MediaFile(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class ImageFeatures(media_id: Long, width: Int, height: Int, channels: Int,
                           mean_intensity: Double, content_hash: String)
  case class ImageHash(media_id: Long, phash: String)
  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Long, duration_sec: Double,
                           mean_abs_amplitude: Double, zero_crossings: Long,
                           energy: Long, content_hash: String)
  case class FrameSample(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])
  case class VideoMeta(media_id: Long, brand: String, duration_sec: Double,
                       timescale: Long, n_tracks: Int, width: Int, height: Int,
                       content_hash: String)

  /** STUB decode for non-image kinds (see object doc): header →
    * (width, height, channels). A real audio/video implementation would
    * hand `bytes` to a codec here; the signature and call-site shape
    * would not change.
    */
  def decodeHeaderStub(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 12, s"media payload too short: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes)
    (bb.getInt(0), bb.getInt(4), bb.getInt(8))
  }

  /** Magic-byte sniff for the formats the JDK's ImageIO decodes out of
    * the box. Sniffing (not the `kind`/`mime` columns) decides the decode
    * path: metadata lies at corpus scale, leading bytes don't.
    */
  def isDecodableImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && {
      val b = bytes
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') || // GIF
      (b(0) == 'B' && b(1) == 'M') // BMP
    }

  /** REAL image decode via `javax.imageio`: (width, height, bands, mean
    * sample intensity over every band of every pixel, 0–255). Fails
    * loudly on bytes that sniffed as an image but don't decode —
    * silently feature-ing garbage is how corrupt shards poison a
    * training corpus.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"image-sniffed payload failed to decode (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    (w, h, bands, sum.toDouble / (w.toLong * h * bands))
  }

  /** RIFF/WAVE sniff narrowed to what [[decodeAudio]] actually handles:
    * the container magic AND the fmt-chunk says linear PCM (codec 1) at
    * 8 or 16 bits. 24/32-bit PCM, IEEE-float (codec 3), ADPCM, and
    * truncated/malformed headers all return false, so one exotic WAV in a
    * shard is skipped rather than failing the whole [[audioFeatures]] job.
    */
  def isDecodableAudio(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E' && {
        // walk RIFF chunks for "fmt " (little-endian sizes)
        def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
        def le32(o: Int) = (bytes(o) & 0xff).toLong | ((bytes(o + 1) & 0xff).toLong << 8) |
          ((bytes(o + 2) & 0xff).toLong << 16) | ((bytes(o + 3) & 0xff).toLong << 24)
        var off = 12
        var found = false
        var ok = false
        while (!found && off + 8 <= bytes.length) {
          val size = le32(off + 4)
          if (bytes(off) == 'f' && bytes(off + 1) == 'm' && bytes(off + 2) == 't' &&
              bytes(off + 3) == ' ') {
            found = true
            ok = size >= 16 && off + 8 + 16 <= bytes.length && {
              val codec = le16(off + 8)
              val bits = le16(off + 8 + 14)
              codec == 1 && (bits == 8 || bits == 16)
            }
          } else if (size < 0 || size > bytes.length) {
            off = bytes.length // malformed declared size: stop, not decodable
          } else off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
        }
        found && ok
      }

  /** REAL audio decode via `javax.sound.sampled` (in the JDK, like
    * ImageIO): (sampleRate, channels, frames, duration, mean |amplitude|,
    * zeroCrossings, energy) over all samples. PCM 16-bit (either
    * endianness) and 8-bit supported — the formats the JDK itself
    * parses.
    *
    * zeroCrossings and energy are EXACT integers (count of adjacent
    * sign flips over the interleaved sample stream — both neighbors
    * strictly nonzero with opposite signs; Σ sample², centered for
    * 8-bit), so the oracle can closed-form them from the synth
    * parameters — a decode that mangles any single sample, not just the
    * mean, hash-mismatches.
    */
  def decodeAudio(bytes: Array[Byte]): (Int, Int, Long, Double, Double, Long, Long) = {
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val duration = frames.toDouble / fmt.getSampleRate
      val data = ais.readAllBytes()
      var zc = 0L; var energy = 0L; var prev = 0L
      val mean = fmt.getSampleSizeInBits match {
        case 16 =>
          val bb = ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var s = 0L; var n = 0
          while (bb.remaining() >= 2) {
            val v = bb.getShort.toLong
            s += math.abs(v); energy += v * v
            if (prev * v < 0) zc += 1
            if (v != 0) prev = v
            n += 1
          }
          if (n == 0) 0.0 else s.toDouble / n
        case 8 =>
          var s = 0L; var i = 0
          while (i < data.length) {
            val v = ((data(i) & 0xff) - 128).toLong
            s += math.abs(v); energy += v * v
            if (prev * v < 0) zc += 1
            if (v != 0) prev = v
            i += 1
          }
          if (data.isEmpty) 0.0 else s.toDouble / data.length
        case other =>
          throw new IllegalArgumentException(s"unsupported PCM width: $other bits")
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, frames, duration, mean, zc, energy)
    } finally ais.close()
  }

  /** Decode + feature-extract the WAV payloads of a media table — same
    * `mapPartitions` shape as [[imageFeatures]] (per-partition decoder
    * setup), same small-features-vs-huge-content separation. Non-WAV
    * rows are skipped (they belong to the image path or the video stub).
    */
  def audioFeatures(ds: Dataset[MediaFile]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.filter(m => isDecodableAudio(m.content)).map { m =>
        val (sr, ch, frames, dur, mean, zc, energy) = decodeAudio(m.content)
        md.reset()
        val hash = md.digest(m.content).map("%02x".format(_)).mkString
        AudioFeatures(m.media_id, sr, ch, frames, dur, mean, zc, energy, hash)
      }
    }
  }

  /** Deterministic synthetic media for the ORACLE-CHECKED feature
    * queries (x_image_features / x_audio_features): a REAL encoder
    * (ImageIO PNG) over closed-form parameters derived from an id. The
    * feature query then runs the REAL decoder over these bytes, and the
    * DuckDB oracle computes the same features directly from the
    * closed-form parameters — so an encode→decode round trip that
    * mangled dimensions, bands, or pixel values would hash-mismatch.
    *
    * Image: grayscale (1+id%16)×(1+(id/16)%16), pixel (x,y) =
    * id%200 + x + y (max 199+30, never wraps). Mean intensity is the
    * exact integer ratio (w·h·base + h·Σx + w·Σy) / (w·h), identical
    * IEEE division in both engines.
    */
  def synthImage(id: Long): Array[Byte] = {
    val w = 1 + (id % 16).toInt
    val h = 1 + ((id / 16) % 16).toInt
    val base = (id % 200).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, base + x + y); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Audio twin of [[synthImage]]: 8 kHz mono 16-bit PCM WAV
    * (AudioSystem's own encoder), 100+(id%50)·10 frames of a ±amp
    * square wave with amp = 100+id%900 — every sample is ±amp, so
    * mean |amplitude| is exactly amp and duration is the exact ratio
    * frames/8000.0 in both engines.
    */
  def synthWav(id: Long): Array[Byte] = {
    import javax.sound.sampled._
    val amp = 100 + (id % 900).toInt
    val frames = 100 + (id % 50).toInt * 10
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bb = ByteBuffer.allocate(frames * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < frames) {
      bb.putShort((if ((i / 25) % 2 == 0) amp else -amp).toShort)
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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
    * so decoder setup happens once per partition, not per row). Real
    * `ImageIO` decode for sniffed image formats; header-stub decode for
    * everything else (audio/video/synthetic). Features are
    * deterministic: mean sample/byte intensity + md5 content hash.
    */
  def imageFeatures(ds: Dataset[MediaFile]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup: no disk-backed ImageIO cache (one
      // tmp file per decode would make this stage IO-bound at scale)
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h, c, mean) =
          if (isDecodableImage(m.content)) decodeImage(m.content)
          else {
            val (sw, sh, sc) = decodeHeaderStub(m.content)
            val payload = m.content.drop(12)
            val smean =
              if (payload.isEmpty) 0.0
              else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
            (sw, sh, sc, smean)
          }
        md.reset()
        val hash = md.digest(m.content).map("%02x".format(_)).mkString
        ImageFeatures(m.media_id, w, h, c, mean, hash)
      }
    }
  }

  /** REAL image resize (nearest-neighbor): decode, sample
    * out(x, y, b) = in(⌊x·sw/w⌋, ⌊y·sh/h⌋, b), re-encode as PNG.
    * Nearest-neighbor deliberately, not Graphics2D interpolation: the
    * mapping is exact integer arithmetic, so resized features are
    * closed-form predictable (oracle-checkable end to end) and
    * bit-identical on any JVM — interpolated scaling is neither. The
    * standard thumbnail/normalize stage of a multimodal training
    * pipeline; runs inside the same mapPartitions decode stage.
    */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"image-sniffed payload failed to decode (${bytes.length} bytes)")
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new java.awt.image.BufferedImage(outW, outH, img.getType match {
      case 0 => java.awt.image.BufferedImage.TYPE_INT_RGB // custom → normalize
      case t => t
    })
    val src = img.getRaster
    val dst = out.getRaster
    val bands = math.min(src.getNumBands, dst.getNumBands)
    var y = 0
    while (y < outH) {
      val sy = y.toLong * sh / outH
      var x = 0
      while (x < outW) {
        val sx = x.toLong * sw / outW
        var b = 0
        while (b < bands) {
          dst.setSample(x, y, b, src.getSample(sx.toInt, sy.toInt, b))
          b += 1
        }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Average-hash (aHash) perceptual fingerprint: nearest-sample the
    * decoded image onto a `grid`×`grid` lattice (same `x·sw/out` floor
    * mapping as [[resizeImage]]), threshold each cell against the
    * lattice MEAN, and emit the bits row-major as a '0'/'1' string —
    * the classic perceptual-dedup hash (Hamming-near hashes = visually
    * near images; equal hashes collapse brightness-shifted duplicates,
    * because adding a constant to every pixel moves each cell and the
    * mean together). The threshold is exact integer arithmetic
    * (`grid²·cell ≥ Σcells`, no division), and the hash is a string,
    * so cross-engine parity is bit-exact with no 64-bit sign games.
    * Grayscale reduction is the band SUM (mean-threshold is scale
    * invariant, so sum vs average changes nothing).
    *
    * Map-only at any scale; downstream dedup is a hash-groupBy (exact)
    * or the SimHash Hamming-band machinery (near) — the hash is
    * designed to feed both.
    */
  def imageAHash(ds: Dataset[MediaFile], grid: Int = 8): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.filter(m => isDecodableImage(m.content)).map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content))
        require(img != null,
          s"image-sniffed payload failed to decode (${m.content.length} bytes)")
        val raster = img.getRaster
        val (sw, sh, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        val cells = new Array[Long](grid * grid)
        var idx = 0
        var yI = 0
        while (yI < grid) {
          val sy = (yI.toLong * sh / grid).toInt
          var xI = 0
          while (xI < grid) {
            val sx = (xI.toLong * sw / grid).toInt
            var s = 0L
            var b = 0
            while (b < bands) { s += raster.getSample(sx, sy, b); b += 1 }
            cells(idx) = s; idx += 1; xI += 1
          }
          yI += 1
        }
        val total = cells.sum
        val n = (grid * grid).toLong
        val sb = new java.lang.StringBuilder(grid * grid)
        cells.foreach(v => sb.append(if (v * n >= total) '1' else '0'))
        ImageHash(m.media_id, sb.toString)
      }
    }
  }

  /** Resize every decodable image in a media table — the batch stage:
    * same per-partition codec setup, content column replaced by the
    * thumbnail, non-images passed through untouched.
    */
  def resizeImages(ds: Dataset[MediaFile], outW: Int, outH: Int): Dataset[MediaFile] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        if (isDecodableImage(m.content)) {
          val resized = resizeImage(m.content, outW, outH)
          m.copy(content = resized,
            meta = m.meta.copy(size_bytes = resized.length.toLong))
        } else m
      }
    }
  }

  /** ISO-BMFF (MP4/MOV-family) sniff: a top-level `ftyp` box at offset 4. */
  def isIsoBmff(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  /** REAL ISO-BMFF container parse (ISO/IEC 14496-12 box structure):
    * major brand from `ftyp`, movie timescale + duration from
    * `moov/mvhd`, track count and presentation dimensions (16.16 fixed
    * → integer pixels, max over tracks — audio tracks carry 0×0) from
    * `moov/trak/tkhd`. This is byte-exact metadata extraction, the
    * stage a real pipeline runs on every video BEFORE deciding what to
    * decode; only pixel/sample decode (which needs codecs this
    * container image doesn't ship) remains out of scope. Handles both
    * box versions (v1 = 64-bit times); fails loudly on malformed sizes
    * like the image path does.
    */
  def parseMp4Meta(bytes: Array[Byte]): (String, Long, Long, Int, Int, Int) = {
    require(isIsoBmff(bytes), s"not an ISO-BMFF payload (${bytes.length} bytes)")
    val bb = ByteBuffer.wrap(bytes) // box fields are big-endian
    def u32(o: Int): Long = bb.getInt(o).toLong & 0xffffffffL
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var width = 0
    var height = 0

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = u32(off)
        val tpe = new String(bytes, off + 4, 4, "ISO-8859-1")
        val boxEnd =
          if (size == 0) end // box extends to the end of the enclosing box
          else if (size == 1) { // 64-bit largesize follows the type
            require(off + 16 <= end, "truncated largesize box")
            val ls = bb.getLong(off + 8)
            require(ls >= 16 && off + ls <= end, s"malformed largesize $ls in '$tpe'")
            off + ls.toInt
          } else {
            require(size >= 8 && off + size <= end, s"malformed box size $size in '$tpe'")
            off + size.toInt
          }
        val payload = off + (if (size == 1) 16 else 8)
        tpe match {
          case "ftyp" if depth == 0 =>
            brand = new String(bytes, payload, 4, "ISO-8859-1")
          case "moov" => walk(payload, boxEnd, depth + 1)
          case "trak" => nTracks += 1; walk(payload, boxEnd, depth + 1)
          case "mvhd" =>
            val v = bytes(payload) & 0xff
            if (v == 1) { timescale = u32(payload + 20); duration = bb.getLong(payload + 24) }
            else { timescale = u32(payload + 12); duration = u32(payload + 16) }
          case "tkhd" =>
            val v = bytes(payload) & 0xff
            val dims = payload + (if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4 + 4) +
              8 + 2 + 2 + 2 + 2 + 36
            // width/height are 16.16 fixed-point at the end of the box
            width = math.max(width, (u32(dims) >> 16).toInt)
            height = math.max(height, (u32(dims + 4) >> 16).toInt)
          case _ => () // leaf we don't need (mdat, mdia, free, ...)
        }
        off = boxEnd
      }
    }
    walk(0, bytes.length, 0)
    (brand, timescale, duration, nTracks, width, height)
  }

  /** Container-metadata extraction for ISO-BMFF payloads — same
    * mapPartitions + small-output shape as [[imageFeatures]]; rows that
    * don't sniff as ISO-BMFF are skipped (they belong to other paths).
    */
  def videoMeta(ds: Dataset[MediaFile]): Dataset[VideoMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.filter(m => isIsoBmff(m.content)).map { m =>
        val (brand, ts, dur, n, w, h) = parseMp4Meta(m.content)
        md.reset()
        val hash = md.digest(m.content).map("%02x".format(_)).mkString
        VideoMeta(m.media_id, brand,
          if (ts == 0) 0.0 else dur.toDouble / ts, ts, n, w, h, hash)
      }
    }
  }

  /** Video twin of [[synthImage]]/[[synthWav]]: a minimal but
    * spec-conformant ISO-BMFF file (ftyp + moov(mvhd, trak(tkhd,
    * mdia(mdhd))…) + mdat) with closed-form parameters, written by this
    * in-house muxer and read back by the REAL parser — the oracle
    * computes the same values directly from the id. Odd ids get a
    * second (audio-shaped, 0×0) track so track counting is exercised.
    */
  def synthMp4(id: Long): Array[Byte] = {
    val timescale = 1000L
    val duration = 2000L + (id % 100) * 500
    val w = 160 + (id % 8).toInt * 16
    val h = 90 + ((id / 8) % 8).toInt * 18
    val tracks = 1 + (id % 2).toInt

    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tpe.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    def fullBox(tpe: String, body: ByteBuffer => Unit, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(size)
      b.putInt(0) // version 0 + flags
      body(b)
      box(tpe, b.array())
    }
    val ftyp = box("ftyp", ByteBuffer.allocate(8)
      .put("isom".getBytes("ISO-8859-1")).putInt(0).array())
    val mvhd = fullBox("mvhd", b => {
      b.putInt(0).putInt(0) // creation/modification time
      b.putInt(timescale.toInt).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
      b.putInt(0).putInt(0) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(tracks + 1) // next_track_ID
    }, 100)
    def tkhd(trackId: Int, tw: Int, th: Int) = fullBox("tkhd", b => {
      b.putInt(0).putInt(0).putInt(trackId).putInt(0).putInt(duration.toInt)
      b.putLong(0) // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      b.putInt(tw << 16).putInt(th << 16)
    }, 84)
    val mdhd = fullBox("mdhd", b => {
      b.putInt(0).putInt(0).putInt(timescale.toInt).putInt(duration.toInt)
      b.putShort(0x55c4.toShort).putShort(0) // language 'und', quality
    }, 24)
    def trak(trackId: Int, tw: Int, th: Int) =
      box("trak", tkhd(trackId, tw, th) ++ box("mdia", mdhd))
    val traks = (1 to tracks).map(i =>
      trak(i, if (i == 1) w else 0, if (i == 1) h else 0))
    val moov = box("moov", mvhd ++ traks.reduce(_ ++ _))
    val mdat = box("mdat", Array.tabulate(64)(i => ((id + i) % 256).toByte))
    ftyp ++ moov ++ mdat
  }

  /** Multi-frame container the JDK decodes frame-by-frame: GIF (87a/89a).
    * Same magic as the image sniff's GIF arm; listed separately because
    * the frame path (not the single-image path) handles it.
    */
  def isDecodableVideo(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'

  /** REAL frame extraction for GIF containers via `javax.imageio`'s
    * multi-image reader API (`ImageReader.read(frameIdx)`): every
    * `stride`-th frame is decoded to pixels and re-encoded as PNG bytes.
    * Frames are read raw (no disposal-method compositing) — each row is
    * the frame as stored, which is what feature extraction wants.
    */
  def decodeGifFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, s"GIF-sniffed payload has no ImageIO reader (${bytes.length} bytes)")
    val reader = readers.next()
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      (0 until n).collect {
        case i if i % stride == 0 =>
          val img = reader.read(i)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (i, bos.toByteArray)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** RIFF/AVI container sniff ('RIFF' magic, 'AVI ' form type). */
  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  /** REAL frame extraction for MJPEG AVI containers, JDK-only: an
    * AVI/RIFF chunk walk (same little-endian chunk grammar the WAV sniff
    * uses) down to the `movi` LIST, where every `##dc`/`##db` stream
    * chunk whose payload starts with a JPEG SOI marker is an
    * independently-encoded JPEG frame — that is the MJPEG codec — and
    * goes through the SAME ImageIO pixel path as still images, re-encoded
    * as PNG like the GIF frame path. Nested `rec ` grouping LISTs are
    * walked recursively. Non-JPEG stream chunks (a codec this JVM can't
    * decode) fail loudly, like every other sniffed-then-undecodable path
    * here.
    */
  def decodeAviFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] = {
    require(isAvi(bytes), s"not a RIFF/AVI payload (${bytes.length} bytes)")
    def le32(o: Int): Long = (bytes(o) & 0xff).toLong |
      ((bytes(o + 1) & 0xff).toLong << 8) |
      ((bytes(o + 2) & 0xff).toLong << 16) | ((bytes(o + 3) & 0xff).toLong << 24)
    def fourcc(o: Int) = new String(bytes, o, 4, "ISO-8859-1")
    javax.imageio.ImageIO.setUseCache(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var frameIdx = 0
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(off)
        val size = le32(off + 4)
        require(size >= 0 && off + 8 + size <= end,
          s"malformed AVI chunk size $size for '$id'")
        if (id == "LIST") {
          val listType = fourcc(off + 8)
          if (listType == "movi" || (inMovi && listType == "rec "))
            walk(off + 12, off + 8 + size.toInt, inMovi = true)
          // hdrl / strl / odml lists carry no frame data — skipped
        } else if (inMovi && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          val p = off + 8
          require(size >= 2 &&
              bytes(p) == 0xff.toByte && bytes(p + 1) == 0xd8.toByte,
            s"stream chunk '$id' is not MJPEG (no JPEG SOI) — codec not decodable here")
          if (frameIdx % stride == 0) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes, p, size.toInt))
            require(img != null, s"MJPEG frame $frameIdx failed to decode")
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            out += ((frameIdx, bos.toByteArray))
          }
          frameIdx += 1
        }
        off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length, inMovi = false)
    out.toSeq
  }

  /** MJPEG-AVI twin of [[synthMp4]]: a minimal RIFF/AVI (hdrl with an
    * avih header, then a movi LIST of `1 + id%3` real ImageIO-encoded
    * JPEG frames) with closed-form frame count and dimensions
    * (16+(id%8)·8 × 16+((id/8)%8)·8, uniform gray 50+40·frameIdx).
    * Dimensions and frame indexes survive the lossy JPEG round trip
    * exactly (only sample values are quantized), so a driver query over
    * the REAL chunk-walk + pixel decode is still oracle-checkable on
    * (frame_idx, width, height).
    */
  def synthMjpegAvi(id: Long): Array[Byte] = {
    val nFrames = 1 + (id % 3).toInt
    val w = 16 + (id % 8).toInt * 8
    val h = 16 + ((id / 8) % 8).toInt * 8
    def chunk(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(tpe.getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
      b.array() // trailing pad byte (if any) stays zero: word alignment
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ISO-8859-1") ++ payload)
    val avih = chunk("avih", {
      val b = ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40000) // microseconds per frame (25 fps)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(nFrames).putInt(0)
      b.putInt(1) // streams
      b.putInt(0).putInt(w).putInt(h)
      b.array()
    })
    val frames = (0 until nFrames).map { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = 50 + 40 * i
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.getRaster.setSample(x, y, 0, g); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      chunk("00dc", bos.toByteArray)
    }
    val body = "AVI ".getBytes("ISO-8859-1") ++
      list("hdrl", avih) ++ list("movi", frames.reduce(_ ++ _))
    chunk("RIFF", body)
  }

  /** Frame sampling for video-kind payloads — the explode-shaped stage a
    * real video pipeline has. GIF containers and MJPEG AVIs get REAL
    * frames ([[decodeGifFrames]] / [[decodeAviFrames]]); only
    * codec-compressed containers this JVM can't decode (H.264-class
    * MP4/MKV) fall back to the stub slicing of every `stride`-th
    * `frameSize`-byte payload chunk — the one remaining decode stub in
    * this module.
    */
  def sampleFrames(ds: Dataset[MediaFile], frameSize: Int, stride: Int): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      if (isDecodableVideo(m.content))
        decodeGifFrames(m.content, stride).map { case (idx, png) =>
          FrameSample(m.media_id, idx, png)
        }
      else if (isAvi(m.content))
        decodeAviFrames(m.content, stride).map { case (idx, png) =>
          FrameSample(m.media_id, idx, png)
        }
      else {
        val payload = m.content.drop(12)
        payload.grouped(frameSize).zipWithIndex.collect {
          case (frame, idx) if idx % stride == 0 => FrameSample(m.media_id, idx, frame)
        }
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
