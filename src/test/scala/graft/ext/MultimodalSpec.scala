package graft.ext

import java.nio.ByteBuffer

import graft.SparkSuite
import graft.ext.Multimodal._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def fakeMedia(id: Long, kind: String, w: Int, h: Int, c: Int,
                        payload: Array[Byte]): MediaFile = {
    val header = ByteBuffer.allocate(12).putInt(w).putInt(h).putInt(c).array()
    MediaFile(id, kind, header ++ payload,
      MediaMeta(s"file_$id.bin", s"$kind/fake", 12L + payload.length))
  }

  test("imageFeatures decodes header, computes deterministic features per partition") {
    val media = asMediaTable(spark, Seq(
      fakeMedia(1L, "image", 640, 480, 3, Array[Byte](10, 20, 30)),
      fakeMedia(2L, "image", 32, 32, 1, Array.fill[Byte](16)(100))))
    val feats = imageFeatures(repartitionForDecode(media, 2))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 640 && feats(1L).height == 480 && feats(1L).channels == 3)
    assert(feats(1L).mean_intensity == 20.0)
    assert(feats(2L).mean_intensity == 100.0)
    assert(feats(1L).content_hash.length == 32)
    // determinism: recompute → identical hashes
    val again = imageFeatures(media).collect().map(f => f.media_id -> f.content_hash).toMap
    assert(again == feats.view.mapValues(_.content_hash).toMap)
  }

  test("imageFeatures decodes a REAL PNG via javax.imageio (width/height/bands/mean from pixels)") {
    // 4x2 grayscale PNG, pixels 0,32,64,96 / 128,160,192,224 → mean 112
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 4)
      img.getRaster.setSample(x, y, 0, (y * 4 + x) * 32)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(isDecodableImage(png)) // sniffed as real image → ImageIO path

    // rgb 1x1 red PNG: 3 bands, mean = (255+0+0)/3
    val rgb = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xff0000)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos2)

    val media = asMediaTable(spark, Seq(
      MediaFile(1L, "image", png, MediaMeta("gray.png", "image/png", png.length.toLong)),
      MediaFile(2L, "image", bos2.toByteArray,
        MediaMeta("red.png", "image/png", bos2.size.toLong)),
      // non-image payload in the same partition → stub path still works
      fakeMedia(3L, "audio", 44100, 2, 16, Array[Byte](50, 70))))
    val feats = imageFeatures(repartitionForDecode(media, 2))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 4 && feats(1L).height == 2 && feats(1L).channels == 1)
    assert(feats(1L).mean_intensity == 112.0)
    assert(feats(2L).width == 1 && feats(2L).height == 1 && feats(2L).channels == 3)
    assert(feats(2L).mean_intensity == 85.0)
    assert(feats(3L).width == 44100 && feats(3L).mean_intensity == 60.0)
  }

  test("audioFeatures decodes a REAL PCM WAV via javax.sound.sampled") {
    import javax.sound.sampled._
    // 0.5 s of 8 kHz mono 16-bit square wave at amplitude 1000
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val samples = Array.tabulate(4000)(i => if ((i / 50) % 2 == 0) 1000 else -1000)
    val bb = ByteBuffer.allocate(8000).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => bb.putShort(s.toShort))
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, 4000L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(isDecodableAudio(wav))

    val ds = asMediaTable(spark, Seq(
      MediaFile(1L, "audio", wav, MediaMeta("sq.wav", "audio/wav", wav.length.toLong)),
      // a non-WAV row must be skipped, not crash the audio path
      fakeMedia(2L, "video", 64, 48, 3, Array.fill(96)(7.toByte))))
    val f = audioFeatures(repartitionForDecode(ds, 2)).collect()
    assert(f.length == 1)
    val a = f.head
    assert(a.media_id == 1L && a.sample_rate == 8000 && a.channels == 1)
    assert(a.n_frames == 4000L && a.duration_sec == 0.5)
    // every sample is ±1000 → mean |amplitude| is exactly 1000
    assert(a.mean_abs_amplitude == 1000.0)
  }

  test("isDecodableAudio admits only what decodeAudio handles (8/16-bit linear PCM)") {
    import javax.sound.sampled._
    def wav(fmt: AudioFormat, nFrames: Int): Array[Byte] = {
      val data = new Array[Byte](nFrames * fmt.getFrameSize)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(isDecodableAudio(wav(new AudioFormat(8000f, 16, 1, true, false), 100)))
    assert(isDecodableAudio(wav(new AudioFormat(8000f, 8, 1, false, false), 100)))
    // 24-bit PCM and IEEE-float are valid RIFF/WAVE but decodeAudio throws on
    // them — the sniff must reject so audioFeatures skips instead of failing
    assert(!isDecodableAudio(wav(new AudioFormat(8000f, 24, 1, true, false), 100)))
    assert(!isDecodableAudio(wav(new AudioFormat(
      AudioFormat.Encoding.PCM_FLOAT, 8000f, 32, 1, 4, 8000f, false), 100)))
    // truncated header: RIFF/WAVE magic but no complete fmt chunk
    val sixteen = wav(new AudioFormat(8000f, 16, 1, true, false), 100)
    assert(!isDecodableAudio(sixteen.take(16)))
    // and a float-WAV row in the table is skipped, not fatal
    val floatWav = wav(new AudioFormat(
      AudioFormat.Encoding.PCM_FLOAT, 8000f, 32, 1, 4, 8000f, false), 100)
    val ds = asMediaTable(spark, Seq(
      MediaFile(1L, "audio", sixteen, MediaMeta("ok.wav", "audio/wav", sixteen.length.toLong)),
      MediaFile(2L, "audio", floatWav, MediaMeta("f32.wav", "audio/wav", floatWav.length.toLong))))
    val decoded = audioFeatures(ds).collect()
    assert(decoded.map(_.media_id).toSeq == Seq(1L))
  }

  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("sampleFrames extracts REAL frames from a 3-frame animated GIF") {
    // 3 frames of 2x2 gray, frame i filled with intensity 40*i
    val frames = (0 until 3).map { i =>
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 2; x <- 0 until 2) img.getRaster.setSample(x, y, 0, 40 * i)
      img
    }
    val gif = animatedGif(frames)
    assert(isDecodableVideo(gif))

    val media = asMediaTable(spark, Seq(
      MediaFile(9L, "video", gif, MediaMeta("anim.gif", "image/gif", gif.length.toLong))))
    val out = sampleFrames(media, frameSize = 0 /* unused on the real path */, stride = 2)
      .collect().map(f => f.frame_idx -> f.frame_bytes).toMap
    assert(out.keySet == Set(0, 2)) // 3 frames, stride 2 keeps 0 and 2
    // frames round-trip as PNG with the original pixel values
    out.foreach { case (idx, png) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 2 && img.getHeight == 2)
      assert(img.getRaster.getSample(0, 0, 0) == 40 * idx,
        s"frame $idx pixel should be ${40 * idx}")
    }
  }

  test("sampleFrames slices payload into stride-sampled frames") {
    val media = asMediaTable(spark, Seq(
      fakeMedia(7L, "video", 16, 16, 3, Array.tabulate[Byte](40)(_.toByte))))
    val frames = sampleFrames(media, frameSize = 10, stride = 2).collect()
      .map(f => f.frame_idx -> f.frame_bytes.toSeq).toMap
    assert(frames.keySet == Set(0, 2)) // frames 0..3 exist, stride 2 keeps 0 and 2
    assert(frames(0) == (0 until 10).map(_.toByte).toSeq)
    assert(frames(2) == (20 until 30).map(_.toByte).toSeq)
  }

  test("featureTable joins small features with metadata, drops the binary column") {
    val media = asMediaTable(spark, Seq(
      fakeMedia(1L, "image", 8, 8, 3, Array[Byte](1, 2, 3))))
    val t = featureTable(media)
    assert(!t.columns.contains("content"))
    val r = t.collect().head
    assert(r.getAs[String]("mime") == "image/fake")
    assert(r.getAs[Long]("size_bytes") == 15L)
  }

  test("resizeImage: exact nearest-neighbor mapping, hand-checked") {
    // 2×1 gray image [10, 20] → 4×2: sx(x) = ⌊x·2/4⌋ = [0,0,1,1]
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 10)
    img.getRaster.setSample(1, 0, 0, 20)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resizeImage(bos.toByteArray, 4, 2)))
    assert(out.getWidth == 4 && out.getHeight == 2)
    for (y <- 0 to 1)
      assert((0 to 3).map(out.getRaster.getSample(_, y, 0)) == Seq(10, 10, 20, 20))
  }

  test("resizeImages: batch stage resizes images, passes non-images through") {
    val rows = Seq(
      MediaFile(1L, "image", synthImage(77L), MediaMeta("a.png", "image/png", 0L)),
      fakeMedia(2L, "blob", 3, 3, 1, Array[Byte](1, 2, 3)))
    val out = resizeImages(spark.createDataset(rows), 8, 8).collect()
      .map(m => m.media_id -> m).toMap
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).content))
    assert(resized.getWidth == 8 && resized.getHeight == 8)
    assert(out(2L).content.sameElements(rows(1).content), "non-image must pass through")
  }

  test("parseMp4Meta round-trips the in-house muxer: brand, timing, tracks, dims") {
    // even id → 1 track, odd id → 2 (second is audio-shaped 0×0)
    for (id <- Seq(0L, 7L, 42L, 199L)) {
      val (brand, ts, dur, n, w, h) = parseMp4Meta(synthMp4(id))
      assert(brand == "isom" && ts == 1000L)
      assert(dur == 2000L + (id % 100) * 500)
      assert(n == 1 + (id % 2).toInt)
      assert(w == 160 + (id % 8).toInt * 16)
      assert(h == 90 + ((id / 8) % 8).toInt * 18)
    }
  }

  test("parseMp4Meta handles version-1 (64-bit) mvhd boxes") {
    // hand-build: ftyp + moov(mvhd v1) — times/duration are 64-bit
    def box(tpe: String, p: Array[Byte]) =
      ByteBuffer.allocate(8 + p.length).putInt(8 + p.length)
        .put(tpe.getBytes("ISO-8859-1")).put(p).array()
    val mvhd = {
      val b = ByteBuffer.allocate(112)
      b.putInt(0x01000000) // version 1
      b.putLong(0).putLong(0) // 64-bit creation/modification
      b.putInt(90000).putLong(450000L) // timescale, 64-bit duration
      box("mvhd", b.array())
    }
    val ftyp = box("ftyp", "mp42".getBytes("ISO-8859-1") ++ Array.fill[Byte](4)(0))
    val (brand, ts, dur, n, _, _) = parseMp4Meta(ftyp ++ box("moov", mvhd))
    assert(brand == "mp42" && ts == 90000L && dur == 450000L && n == 0)
  }

  test("parseMp4Meta fails loudly on malformed box sizes") {
    val good = synthMp4(3L)
    val bad = good.clone()
    // corrupt the moov box size to overrun the file
    val moovOff = 16 // ftyp is 16 bytes in the synthetic layout
    ByteBuffer.wrap(bad).putInt(moovOff, Int.MaxValue)
    intercept[IllegalArgumentException](parseMp4Meta(bad))
    intercept[IllegalArgumentException](parseMp4Meta(Array[Byte](1, 2, 3)))
  }

  test("videoMeta extracts container metadata distributed, skips non-BMFF rows") {
    val rows = (0L to 9L).map { id =>
      MediaFile(id, "video", synthMp4(id),
        MediaMeta(s"v_$id.mp4", "video/mp4", 0L))
    } :+ fakeMedia(99L, "blob", 1, 1, 1, Array[Byte](9, 9))
    val got = videoMeta(spark.createDataset(rows)).collect()
      .map(v => v.media_id -> v).toMap
    assert(got.size == 10 && !got.contains(99L))
    assert(got(5L).n_tracks == 2 && got(4L).n_tracks == 1)
    assert(got(3L).duration_sec == 3.5 && got(3L).width == 208)
  }

  test("imageAHash: hand-checked lattice bits on a half-dark image") {
    // 2x1 image [0, 255]: 8x8 nearest sampling takes x<4 -> pixel 0,
    // x>=4 -> pixel 255; mean sits between -> each row is 00001111
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 0)
    img.getRaster.setSample(1, 0, 0, 255)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = spark.createDataset(Seq(
      MediaFile(1L, "image", bos.toByteArray,
        MediaMeta("half.png", "image/png", bos.size.toLong))))
    val out = Multimodal.imageAHash(media).collect()
    assert(out.length == 1)
    assert(out.head.phash == "00001111" * 8)
  }

  test("imageAHash: brightness-shifted duplicates collapse; different shapes differ") {
    // synthImage(id): w = 1 + id%16, h = 1 + (id/16)%16, base = id%200.
    // ids 3 and 259 share (w=4, h=1) with bases 3 vs 59 -> same hash;
    // id 19 has (w=4, h=2) -> extra sy term in the lower rows -> differs
    def media(ids: Long*) = spark.createDataset(ids.map { id =>
      val png = synthImage(id)
      MediaFile(id, "image", png, MediaMeta(s"$id.png", "image/png", png.length.toLong))
    })
    val h = Multimodal.imageAHash(media(3L, 259L, 19L)).collect()
      .map(r => r.media_id -> r.phash).toMap
    assert(h(3L) == h(259L), "brightness shift must not change the hash")
    assert(h(3L) != h(19L), "different aspect must change the hash")
    assert(h.values.forall(p => p.length == 64 && p.forall(c => c == '0' || c == '1')))
  }

  test("decode stub fails loudly on truncated payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeHeaderStub(Array[Byte](1, 2, 3))
    }
  }

  test("decodeAviFrames: REAL pixels from a synthesized 3-frame MJPEG AVI") {
    // id = 2 → 3 frames of 32×16 uniform gray (50, 90, 130)
    val avi = synthMjpegAvi(2L)
    assert(isAvi(avi) && !isDecodableVideo(avi) && !isDecodableImage(avi))
    val frames = decodeAviFrames(avi, stride = 1)
    assert(frames.map(_._1) == Seq(0, 1, 2))
    frames.foreach { case (idx, png) =>
      // each extracted frame is a decodable PNG with the source dims and
      // pixel values within JPEG DC-quantization distance of the source
      val (w, h, bands, mean) = decodeImage(png)
      assert((w, h, bands) == (32, 16, 1), s"frame $idx decoded ${w}x$h")
      val expected = 50 + 40 * idx
      assert(math.abs(mean - expected) <= 3.0,
        s"frame $idx mean $mean vs uniform source $expected — not real pixels")
    }
    // stride skips frames by index
    assert(decodeAviFrames(avi, stride = 2).map(_._1) == Seq(0, 2))
  }

  test("sampleFrames dispatches AVI to the real MJPEG path, keeps the stub for unknown kinds") {
    val avi = MediaFile(1L, "video", synthMjpegAvi(1L),
      MediaMeta("v_1.avi", "video/x-msvideo", 0L))
    val blob = fakeMedia(2L, "video", 4, 4, 1, Array.fill(32)(7.toByte))
    val got = sampleFrames(spark.createDataset(Seq(avi, blob)),
        frameSize = 16, stride = 1)
      .collect().groupBy(_.media_id)
    // id 1 → 2 real PNG frames; id 2 → stub slices
    assert(got(1L).length == 2)
    got(1L).foreach(f => assert(isDecodableImage(f.frame_bytes)))
    assert(got(2L).nonEmpty)
    got(2L).foreach(f => assert(!isDecodableImage(f.frame_bytes)))
  }

  test("decodeAviFrames fails loudly on a non-MJPEG stream chunk") {
    // hand-build an AVI whose 00dc payload is not JPEG
    val bogus = {
      def chunk(tpe: String, payload: Array[Byte]): Array[Byte] = {
        val b = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put(tpe.getBytes("ISO-8859-1")).putInt(payload.length).put(payload)
        b.array()
      }
      val movi = chunk("LIST", "movi".getBytes("ISO-8859-1") ++
        chunk("00dc", Array[Byte](1, 2, 3, 4)))
      chunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++ movi)
    }
    intercept[IllegalArgumentException] { decodeAviFrames(bogus, 1) }
  }
}
