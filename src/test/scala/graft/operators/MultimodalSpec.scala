package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def bytes(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 251).toByte)

  def media = Seq(
    MediaRow(1, "image", bytes(1, 400), 20, 20, 0, 0),
    MediaRow(2, "image", bytes(1, 400), 20, 20, 0, 0), // exact dup of 1
    MediaRow(3, "image", bytes(3, 400), 20, 20, 0, 0),
    MediaRow(4, "audio", bytes(4, 800), 0, 0, 16000, 0),
    MediaRow(5, "video", bytes(5, 1200), 16, 16, 0, 6)).toDS()

  test("decode emits width×height pixels in [0,1], deterministic") {
    val imgs = decodeImages(spark, media).collect()
      .map(i => i.media_id -> i).toMap
    assert(imgs.keySet == Set(1L, 2L, 3L))
    assert(imgs(1L).pixels.length == 400)
    assert(imgs(1L).pixels.forall(p => p >= 0f && p <= 1f))
    // same content → same pixels; different content differs
    assert(imgs(1L).pixels.toSeq == imgs(2L).pixels.toSeq)
    assert(imgs(1L).pixels.toSeq != imgs(3L).pixels.toSeq)
  }

  /** A real 8-bit grayscale PNG with a known gradient, encoded through
    * the JDK's own writer. */
  def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, (y * w + x) % 256)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG bytes decode to the actual pixels via javax.imageio") {
    val png = realPng(16, 12)
    // declared metadata dims are WRONG on purpose: the real decode must
    // take dimensions from the image itself, not the metadata
    val rows = Seq(MediaRow(7, "image", png, 999, 999, 0, 0)).toDS()
    val img = decodeImages(spark, rows).collect().head
    assert(img.width == 16 && img.height == 12)
    assert(img.pixels.length == 192)
    // gray pixel v decodes to luma v/255 (BT.601 weights sum to 1)
    for (i <- 0 until 192) {
      val expected = ((i % 256).toFloat) / 255f
      assert(math.abs(img.pixels(i) - expected) < 1e-3,
        s"pixel $i: got ${img.pixels(i)} expected $expected")
    }
    // and features flow from the REAL pixels through the same path
    val feat = extractFeatures(spark, rows, dim = 8).collect().head
    val meanPx = img.pixels.sum / img.pixels.length
    val meanEmb = feat.embedding.sum / feat.embedding.length
    assert(math.abs(meanPx - meanEmb) < 1e-3)
  }

  test("non-decodable bytes fall back to the deterministic fake codec") {
    val junk = Seq(MediaRow(8, "image", bytes(8, 100), 10, 10, 0, 0)).toDS()
    val img = decodeImages(spark, junk).collect().head
    assert(img.width == 10 && img.height == 10) // metadata dims
    assert(img.pixels.toSeq ==
      FakeCodec.decodeImage(bytes(8, 100), 10, 10).toSeq)
  }

  /** A real 16-bit little-endian PCM WAV with known sample values,
    * encoded through the JDK's own writer. */
  def realWav(samples: Array[Short], rate: Float = 16000f,
      channels: Int = 1): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
      true, false) // signed, little-endian
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt,
      samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV bytes decode to the exact PCM samples via " +
      "javax.sound.sampled") {
    val pcm = Array[Short](0, 16384, -16384, 32767, -32768, 1, -1, 12345)
    val wav = realWav(pcm, rate = 22050f)
    // declared metadata rate is WRONG on purpose: the real decode must
    // take the rate from the container, not the metadata
    val rows = Seq(MediaRow(9, "audio", wav, 0, 0, 8000, 0)).toDS()
    val a = decodeAudio(spark, rows).collect().head
    assert(a.sample_rate == 22050 && a.n_channels == 1)
    assert(a.samples.length == pcm.length)
    for (i <- pcm.indices)
      assert(a.samples(i) == pcm(i) / 32768f,
        s"sample $i: got ${a.samples(i)} expected ${pcm(i) / 32768f}")
    // and features flow from the REAL samples through the same path
    val feat = extractFeatures(spark, rows, dim = 4).collect().head
    val meanS = a.samples.sum / a.samples.length
    val meanEmb = feat.embedding.sum / feat.embedding.length
    assert(math.abs(meanS - meanEmb) < 1e-3)
  }

  test("stereo WAV mixes channels to mono by averaging") {
    // interleaved L/R frames: L = 1000·k, R = -1000·k → mono mix 0
    val inter = (1 to 4).flatMap(k =>
      Seq((1000 * k).toShort, (-1000 * k).toShort)).toArray
    val rows = Seq(MediaRow(10, "audio", realWav(inter, channels = 2),
      0, 0, 0, 0)).toDS()
    val a = decodeAudio(spark, rows).collect().head
    assert(a.n_channels == 2 && a.samples.length == 4)
    assert(a.samples.forall(_ == 0f))
  }

  test("non-decodable audio bytes fall back to the deterministic fake") {
    val junk = Seq(MediaRow(11, "audio", bytes(11, 64), 0, 0, 4000, 0))
      .toDS()
    val a = decodeAudio(spark, junk).collect().head
    assert(a.sample_rate == 4000) // metadata rate
    assert(a.samples.toSeq ==
      FakeCodec.decodeAudio(bytes(11, 64), 64).toSeq)
    assert(a.samples.forall(s => s >= -1f && s <= 1f))
  }

  test("resize keeps schema, changes shape") {
    val small = resize(spark, decodeImages(spark, media), 5, 4).collect()
    assert(small.forall(i => i.width == 5 && i.height == 4 &&
      i.pixels.length == 20))
  }

  test("feature extraction: fixed dim for every modality") {
    val feats = extractFeatures(spark, media, dim = 32).collect()
    assert(feats.length == 5)
    assert(feats.forall(_.embedding.length == 32))
    val byId = feats.map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(byId(1L) == byId(2L)) // dup payloads → identical embeddings
    assert(byId(1L) != byId(3L))
  }

  /** An animated GIF with `n` constant-gray frames (value 10·i),
    * written through the JDK's own sequence writer. */
  def animatedGif(n: Int, w: Int = 8, h: Int = 6): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until n) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.getRaster
      for (y <- 0 until h; x <- 0 until w) g.setSample(x, y, 0, 10 * i)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("real animated-GIF payloads demux to actual frames as PNGs") {
    val gif = animatedGif(5)
    // declared n_frames is WRONG on purpose: real demux must take the
    // frame count from the container
    val rows = Seq(MediaRow(12, "video", gif, 8, 6, 0, 99)).toDS()
    val frames = sampleFrames(spark, rows, stride = 2).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    for (f <- frames) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.content))
      assert(img.getWidth == 8 && img.getHeight == 6)
      // constant gray 10·idx survives GIF palette + PNG round trip
      // (raster sample, NOT getRGB — getRGB would push linear gray
      // through the sRGB transfer curve)
      val lum = img.getRaster.getSample(3, 3, 0)
      assert(lum == 10 * f.frame_idx,
        s"frame ${f.frame_idx}: got gray $lum")
    }
  }

  /** Build an MJPEG-in-AVI container: a RIFF tree with a `movi` LIST
    * holding one `00dc` chunk per frame, each a real JDK-encoded JPEG.
    * Minimal but structurally valid RIFF (even-padded chunks, correct
    * sizes) — exactly the surface the demuxer walks. */
  def mjpegAvi(n: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val sz = data.length
      val out = new java.io.ByteArrayOutputStream()
      out.write(id.getBytes("US-ASCII"))
      out.write(Array[Byte]((sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
        ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte))
      out.write(data)
      if ((sz & 1) == 1) out.write(0)
      out.toByteArray
    }
    val jpegs = (0 until n).map { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.getRaster
      for (y <- 0 until h; x <- 0 until w) g.setSample(x, y, 0, 20 * i)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val movi = "movi".getBytes("US-ASCII") ++
      jpegs.flatMap(j => chunk("00dc", j))
    val body = "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi)
    chunk("RIFF", body)
  }

  /** Build a minimal-but-valid MJPEG-in-MP4: ftyp + mdat holding the
    * JPEG samples + moov/trak/mdia/minf/stbl with stsd('jpeg'), a
    * per-sample stsz, a single-run stsc and a one-chunk stco pointing
    * into mdat — exactly the sample-table surface the demuxer walks. */
  def mjpegMp4(n: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ name.getBytes("US-ASCII") ++ payload
    val jpegs = (0 until n).map { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = img.getRaster
      for (y <- 0 until h; x <- 0 until w) g.setSample(x, y, 0, 20 * i)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0))
    val mdat = box("mdat", jpegs.flatten.toArray)
    val firstSampleOffset = ftyp.length + 8L // into mdat payload
    val stsd = box("stsd", u32(0) ++ u32(1) ++
      (u32(8) ++ "jpeg".getBytes("US-ASCII")))
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(n.toLong) ++
      jpegs.flatMap(j => u32(j.length.toLong)).toArray)
    val stsc = box("stsc", u32(0) ++ u32(1) ++
      u32(1) ++ u32(n.toLong) ++ u32(1))
    val stco = box("stco", u32(0) ++ u32(1) ++ u32(firstSampleOffset))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    ftyp ++ mdat ++ moov
  }

  test("MJPEG-in-MP4 demuxes to real frames through the seam") {
    Multimodal.registerVideoDemuxer(Multimodal.MjpegMp4Demuxer)
    try {
      val mp4 = mjpegMp4(4)
      // declared n_frames is WRONG on purpose: the count must come
      // from the sample tables, proving the stub chunker was not used
      val rows = Seq(MediaRow(40, "video", mp4, 16, 12, 0, 99)).toDS()
      val frames = sampleFrames(spark, rows, stride = 1).collect()
        .sortBy(_.frame_idx)
      assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
      for (f <- frames) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.content))
        assert(img.getWidth == 16 && img.getHeight == 12)
        val lum = img.getRaster.getSample(8, 6, 0)
        assert(math.abs(lum - 20 * f.frame_idx) <= 2,
          s"frame ${f.frame_idx}: got gray $lum")
      }
      val strided = sampleFrames(spark, rows, stride = 2).collect()
      assert(strided.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
      // an MP4 with a non-JPEG codec (e.g. avc1): demux returns None
      // and the row falls through to the stub chunker
      val avc = {
        val base = mjpegMp4(2)
        val s = new String(base, "ISO-8859-1")
        val i = s.indexOf("jpeg", s.indexOf("stsd"))
        base.patch(i, "avc1".getBytes("US-ASCII"), 4).toArray
      }
      val rows2 = Seq(MediaRow(41, "video", avc, 4, 4, 0, 3)).toDS()
      val stub = sampleFrames(spark, rows2, stride = 1).collect()
      assert(stub.length == 3) // declared n_frames: stub path
    } finally Multimodal.clearVideoDemuxers()
  }

  test("MJPEG-in-AVI demuxes to real frames through the seam") {
    Multimodal.registerVideoDemuxer(Multimodal.MjpegAviDemuxer)
    try {
      val avi = mjpegAvi(4)
      // declared n_frames is WRONG on purpose: frame count must come
      // from the container, proving the stub chunker was not used
      val rows = Seq(MediaRow(30, "video", avi, 16, 12, 0, 99)).toDS()
      val frames = sampleFrames(spark, rows, stride = 1).collect()
        .sortBy(_.frame_idx)
      assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
      for (f <- frames) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.content))
        assert(img.getWidth == 16 && img.getHeight == 12)
        // constant-gray JPEG decodes near-exactly (DC-only block)
        val lum = img.getRaster.getSample(8, 6, 0)
        assert(math.abs(lum - 20 * f.frame_idx) <= 2,
          s"frame ${f.frame_idx}: got gray $lum")
      }
      // stride respects container frame order
      val strided = sampleFrames(spark, rows, stride = 2).collect()
      assert(strided.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
      // an AVI with no MJPEG chunks: demux returns None and the row
      // falls through to the stub chunker
      val junk = "RIFF".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ "AVI ".getBytes("US-ASCII")
      val rows2 = Seq(MediaRow(31, "video", junk, 4, 4, 0, 3)).toDS()
      val stub = sampleFrames(spark, rows2, stride = 1).collect()
      assert(stub.length == 3) // declared n_frames: stub path
    } finally Multimodal.clearVideoDemuxers()
  }

  test("registered VideoDemuxer takes precedence over built-ins and " +
      "unclaimed payloads fall through to the stub") {
    Multimodal.registerVideoDemuxer(new MagicDemuxer)
    try {
      val payload = "MXcontainer-payload".getBytes("UTF-8")
      val rows = Seq(MediaRow(20, "video", payload, 4, 4, 0, 7)).toDS()
      val frames = sampleFrames(spark, rows, stride = 1).collect()
        .sortBy(_.frame_idx)
      assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2))
      assert(frames.map(_.content.head).toSeq ==
        Seq(1.toByte, 2.toByte, 3.toByte))
      val other = Seq(
        MediaRow(21, "video", Array.fill[Byte](100)(9), 4, 4, 0, 4))
        .toDS()
      val stub = sampleFrames(spark, other, stride = 2).collect()
      assert(stub.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    } finally Multimodal.clearVideoDemuxers()
  }

  test("frame sampling: one row per sampled frame, chunked payload") {
    val frames = sampleFrames(spark, media, stride = 2).collect()
    assert(frames.map(_.media_id).distinct.toSeq == Seq(5L))
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.content.length == 200)) // 1200 / 6 frames
  }

  test("binary exact dedup finds the duplicate payload") {
    val groups = exactDupGroups(media.toDF())
      .filter($"n_copies" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 1L)
  }

  test("embedding near-dup candidates surface the exact dup pair") {
    val cands = nearDupCandidates(spark, media, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
  }
}

/** Top-level (serializable without an outer spec reference): a fake
  * container demuxer claiming payloads that start with "MX". */
private class MagicDemuxer extends Multimodal.VideoDemuxer {
  def canDemux(c: Array[Byte]): Boolean =
    c.length >= 2 && c(0) == 'M'.toByte && c(1) == 'X'.toByte
  def demux(c: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
    Some(IndexedSeq(Array[Byte](1), Array[Byte](2), Array[Byte](3)))
}
