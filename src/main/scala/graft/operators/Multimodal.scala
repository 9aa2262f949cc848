package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque BINARY columns with typed metadata, processed by
  * `mapPartitions` batch operators (the Scala-native equivalent of the
  * PySpark `mapInPandas` pattern — one iterator-to-iterator pass per
  * partition, no per-row driver involvement, arbitrary native libs
  * callable inside).
  *
  * IMAGE decode is REAL: [[ImageCodec]] reads PNG/JPEG/BMP/GIF through
  * `javax.imageio` (ships in the JDK — zero extra dependencies) and
  * emits row-major grayscale in [0,1]. AUDIO decode is REAL:
  * [[AudioCodec]] reads WAV/AIFF/AU PCM through `javax.sound.sampled`
  * (also JDK-native) and emits mono-mixed samples in [-1,1]. VIDEO
  * frame demux is REAL for image-sequence containers the JDK can read
  * (animated GIF): [[VideoCodec]] extracts actual frames and re-encodes
  * them as standalone PNGs. Payloads that aren't decodable — e.g.
  * MP4/MKV, whose codecs are not in this container — fall back to
  * `FakeCodec` / stub chunking, a deterministic path that derives
  * pixel/sample data from xxhash-style mixing of the bytes, so every
  * pipeline stage (schemas, partitioning, batch iteration, metadata
  * propagation, feature shapes) stays real and testable with synthetic
  * payloads, and a production codec drops in by replacing one function.
  */
object Multimodal {

  /** A media row: binary payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String, // image | audio | video
      content: Array[Byte],
      width: Int, height: Int, // images/video
      sample_rate: Int, // audio
      n_frames: Int) // video

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      pixels: Array[Float]) // row-major grayscale in [0,1]

  final case class DecodedAudio(media_id: Long, sample_rate: Int,
      n_channels: Int, samples: Array[Float]) // mono-mixed, in [-1,1]

  final case class MediaFeature(media_id: Long, media_type: String,
      embedding: Array[Float])

  final case class VideoFrame(media_id: Long, frame_idx: Int,
      content: Array[Byte])

  /** REAL image codec over `javax.imageio` (JDK built-in readers: PNG,
    * JPEG, BMP, GIF, WBMP). Grayscale conversion uses the ITU-R BT.601
    * luma weights; already-gray images round-trip exactly (the weights
    * sum to 1). Returns None when the bytes aren't a decodable image —
    * callers fall back to [[FakeCodec]] so synthetic fixtures still flow
    * through the identical pipeline. Decoding is per-row CPU work inside
    * `mapPartitions`; no state is shared, so executor parallelism is
    * untouched. */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

    def decodeImage(content: Array[Byte]): Option[DecodedImage] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val px = new Array[Float](w * h)
          // Gray images: read raster samples directly — getRGB would
          // push linear gray through the sRGB transfer curve (gamma)
          // and corrupt the values.
          val gray = img.getColorModel.getColorSpace.getType ==
            java.awt.color.ColorSpace.TYPE_GRAY
          val grayMax =
            if (gray) ((1 << img.getColorModel.getComponentSize(0)) - 1)
              .toFloat
            else 0f
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) =
                if (gray) raster.getSample(x, y, 0) / grayMax
                else {
                  val rgb = img.getRGB(x, y)
                  val r = (rgb >> 16) & 0xff
                  val g = (rgb >> 8) & 0xff
                  val b = rgb & 0xff
                  (0.299f * r + 0.587f * g + 0.114f * b) / 255f
                }
              x += 1
            }
            y += 1
          }
          Some(DecodedImage(0L, w, h, px))
        }
      } catch {
        // ImageIO plugin readers and the per-pixel conversion can throw
        // RuntimeExceptions (IllegalArgumentException, CMMException,
        // ArrayIndexOutOfBounds) on truncated/malformed payloads — any
        // such payload must degrade to the deterministic fallback, not
        // fail the task (and with retries, the whole corpus job).
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** REAL audio codec over `javax.sound.sampled` (JDK built-in WAV/AIFF/
    * AU readers — zero extra dependencies). Supports PCM signed/unsigned,
    * 8/16/24/32-bit, either endianness; multi-channel frames are mixed
    * to mono by averaging (each channel normalized to [-1,1] first).
    * Returns None when the bytes aren't a decodable audio container —
    * callers fall back to [[FakeCodec]], mirroring the image seam. */
  object AudioCodec {

    def decodeAudio(content: Array[Byte]): Option[DecodedAudio] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val f = in.getFormat
          val enc = f.getEncoding
          val signed =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned =
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = f.getSampleSizeInBits
          val ch = f.getChannels
          if ((!signed && !unsigned) || bits % 8 != 0 || bits > 32 ||
            ch < 1) None
          else {
            val bytes = in.readAllBytes()
            val bps = bits / 8
            val frameBytes = bps * ch
            val nFrames = bytes.length / frameBytes
            val half = (1L << (bits - 1)).toFloat
            val out = new Array[Float](nFrames)
            var fr = 0
            while (fr < nFrames) {
              var sum = 0f
              var c = 0
              while (c < ch) {
                val off = fr * frameBytes + c * bps
                var raw = 0L
                var b = 0
                while (b < bps) {
                  val idx = if (f.isBigEndian) off + b else off + bps - 1 - b
                  raw = (raw << 8) | (bytes(idx) & 0xffL)
                  b += 1
                }
                // sign-extend (signed) or re-center (unsigned)
                val v =
                  if (signed) (raw << (64 - bits)) >> (64 - bits)
                  else raw - (1L << (bits - 1))
                sum += v / half
                c += 1
              }
              out(fr) = sum / ch
              fr += 1
            }
            Some(DecodedAudio(0L, f.getSampleRate.toInt, ch, out))
          }
        } finally in.close()
      } catch {
        // UnsupportedAudioFileException on non-audio bytes; plugin
        // readers can also throw RuntimeExceptions on malformed
        // containers — all degrade to the deterministic fallback.
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** STUB codec for the modalities without a container codec (video)
    * and for non-decodable image/audio payloads in tests — deterministic
    * splitmix64 mixing of content bytes. Everything downstream is
    * codec-agnostic. */
  object FakeCodec {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    def contentHash(bytes: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = mix(h ^ bytes(i)); i += 1 }
      h
    }

    /** ??? in a real deployment — here: deterministic fake pixels. */
    def decodeImage(content: Array[Byte], width: Int,
        height: Int): Array[Float] = {
      val seed = contentHash(content)
      Array.tabulate(width * height)(i =>
        ((mix(seed + i) >>> 11).toDouble / (1L << 53)).toFloat)
    }

    /** ??? in a real deployment — here: deterministic fake mono
      * samples in [-1,1], one per content byte. */
    def decodeAudio(content: Array[Byte], nSamples: Int): Array[Float] = {
      val seed = contentHash(content)
      Array.tabulate(nSamples)(i =>
        (((mix(seed + i) >>> 11).toDouble / (1L << 53)) * 2 - 1).toFloat)
    }
  }

  /** Decode one image payload: real `javax.imageio` decode when the
    * bytes are a decodable image (dimensions come from the image itself),
    * deterministic fake otherwise (dimensions from the declared
    * metadata). */
  private def decodeOne(m: MediaRow): DecodedImage =
    ImageCodec.decodeImage(m.content) match {
      case Some(d) => DecodedImage(m.media_id, d.width, d.height, d.pixels)
      case None => DecodedImage(m.media_id, m.width, m.height,
        FakeCodec.decodeImage(m.content, m.width, m.height))
    }

  /** Decode one audio payload: real `javax.sound.sampled` decode when
    * the bytes are a decodable container (rate/channels come from the
    * container itself), deterministic fake otherwise (rate from the
    * declared metadata, one sample per content byte). */
  private def decodeOneAudio(m: MediaRow): DecodedAudio =
    AudioCodec.decodeAudio(m.content) match {
      case Some(d) =>
        DecodedAudio(m.media_id, d.sample_rate, d.n_channels, d.samples)
      case None => DecodedAudio(m.media_id, m.sample_rate, 1,
        FakeCodec.decodeAudio(m.content, m.content.length))
    }

  /** Decode images partition-wise (batch iterator in, batch iterator
    * out — the mapInPandas shape). */
  def decodeImages(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import spark.implicits._
    media.filter(_.media_type == "image").mapPartitions { it =>
      it.map(decodeOne)
    }
  }

  /** Decode audio partition-wise — same iterator-to-iterator shape as
    * [[decodeImages]]. */
  def decodeAudio(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.filter(_.media_type == "audio").mapPartitions { it =>
      it.map(decodeOneAudio)
    }
  }

  /** Resize decoded images by nearest-neighbour sampling — pure pixel
    * arithmetic, runs wherever the decode ran. */
  def resize(spark: SparkSession, images: Dataset[DecodedImage],
      newW: Int, newH: Int): Dataset[DecodedImage] = {
    import spark.implicits._
    images.mapPartitions { it =>
      it.map { img =>
        val out = Array.tabulate(newW * newH) { i =>
          val x = (i % newW) * img.width / newW
          val y = (i / newW) * img.height / newH
          img.pixels(y * img.width + x)
        }
        DecodedImage(img.media_id, newW, newH, out)
      }
    }
  }

  /** Mean-pool a signal onto a dim-length grid — the shared pooling
    * step for image pixels and audio samples. Empty input → zeros. */
  private def meanPool(xs: Array[Float], dim: Int): Array[Float] =
    if (xs.isEmpty) new Array[Float](dim)
    else Array.tabulate(dim) { d =>
      val lo = d.toLong * xs.length / dim
      val hi = math.max(lo + 1, (d + 1).toLong * xs.length / dim)
      var s = 0f; var i = lo
      while (i < hi) { s += xs(i.toInt); i += 1 }
      s / (hi - lo)
    }

  /** Feature extraction: fixed-dim embedding per media row (a coarse
    * mean-pooled grid over decoded pixels for images and decoded
    * samples for audio; hash features for video, whose demuxer is
    * stubbed) — the batch shape a real vision/audio encoder uses. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      dim: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val emb = m.media_type match {
          case "image" => meanPool(decodeOne(m).pixels, dim)
          case "audio" => meanPool(decodeOneAudio(m).samples, dim)
          case _ =>
            val seed = FakeCodec.contentHash(m.content)
            Array.tabulate(dim)(i =>
              ((seed * (i + 1)) >>> 40).toFloat / (1 << 24))
        }
        MediaFeature(m.media_id, m.media_type, emb)
      }
    }
  }

  /** REAL multi-frame codec over `javax.imageio`'s sequence readers
    * (animated GIF ships in the JDK; multi-page TIFF too on JDKs with
    * the TIFF plugin). Returns the per-frame images, each re-encoded
    * as standalone PNG bytes (deterministic for a given JDK), or None
    * when the payload has no decodable image sequence. */
  object VideoCodec {

    def decodeFrames(content: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); return None }
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map { i =>
            val img = reader.read(i)
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", out)
            out.toByteArray
          })
        } finally { reader.dispose(); iis.close() }
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Pluggable container demuxer: the JDK has no MP4/WebM demuxer, so
    * deployments that need real video containers plug an
    * implementation (e.g. an ffmpeg/JavaCV binding) in here instead of
    * forking the operator. Implementations must be Serializable — the
    * registry snapshot is captured into the task closure at plan time,
    * so registration must happen on the DRIVER before the query runs.
    * `demux` returns each selected frame as standalone image bytes
    * (PNG recommended — it is what the downstream image codec and
    * feature extractors expect). */
  trait VideoDemuxer extends Serializable {
    /** Cheap container sniff (magic bytes); `demux` is only tried when
      * this returns true. */
    def canDemux(content: Array[Byte]): Boolean
    /** Full demux to per-frame standalone image payloads; None = the
      * payload turned out not to be decodable after all. */
    def demux(content: Array[Byte]): Option[IndexedSeq[Array[Byte]]]
  }

  @volatile private var videoDemuxers: List[VideoDemuxer] = Nil

  /** Register a container demuxer (driver-side, before planning).
    * Demuxers are tried in registration order, before the built-in
    * ImageIO sequence reader (GIF) and the stub chunker. */
  def registerVideoDemuxer(d: VideoDemuxer): Unit =
    synchronized { videoDemuxers = videoDemuxers :+ d }

  /** Remove all registered demuxers (test hygiene). */
  def clearVideoDemuxers(): Unit = synchronized { videoDemuxers = Nil }

  /** REAL non-GIF container demuxer through the [[VideoDemuxer]] seam:
    * MJPEG-in-AVI. AVI is a RIFF container (public spec: Microsoft
    * "AVI RIFF File Reference"); an MJPEG stream stores every frame as
    * a standalone JPEG inside `##db`/`##dc` stream chunks, and the JDK
    * ships a JPEG reader — so the whole demux is walk-the-chunk-tree +
    * `ImageIO`, no native codec. Frames re-encode as PNG, the payload
    * contract downstream decoders expect. Not auto-registered: call
    * `registerVideoDemuxer(MjpegAviDemuxer)` on the driver (the
    * registry snapshot is captured at plan time). */
  object MjpegAviDemuxer extends VideoDemuxer {
    private def fourcc(b: Array[Byte], off: Int): String =
      if (off < 0 || off + 4 > b.length) ""
      else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    def canDemux(content: Array[Byte]): Boolean =
      content.length >= 12 && fourcc(content, 0) == "RIFF" &&
        fourcc(content, 8) == "AVI "

    def demux(content: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
      try {
        val frames = IndexedSeq.newBuilder[Array[Byte]]
        // Walk the RIFF chunk tree: LIST/RIFF nodes recurse (their data
        // starts with a 4-byte list type), leaf chunks advance by their
        // even-padded size. MJPEG frames live in `NNdb`/`NNdc` chunks
        // (NN = stream number) and start with the JPEG SOI marker.
        def walk(start: Long, end: Long): Unit = {
          var off = start
          while (off + 8 <= end) {
            val id = fourcc(content, off.toInt)
            val sz = u32(content, off.toInt + 4)
            val dataStart = off + 8
            val dataEnd = math.min(dataStart + sz, end)
            if (id == "RIFF" || id == "LIST") walk(dataStart + 4, dataEnd)
            else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
                (id.substring(2) == "db" || id.substring(2) == "dc") &&
                sz >= 2 && dataEnd <= content.length &&
                (content(dataStart.toInt) & 0xff) == 0xff &&
                (content(dataStart.toInt + 1) & 0xff) == 0xd8) {
              val jpeg = java.util.Arrays.copyOfRange(content,
                dataStart.toInt, dataEnd.toInt)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(jpeg))
              if (img != null) {
                val out = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(img, "png", out)
                frames += out.toByteArray
              }
            }
            off = dataStart + sz + (sz & 1L)
          }
        }
        val riffEnd = math.min(8L + u32(content, 4), content.length.toLong)
        walk(12L, riffEnd)
        val out = frames.result()
        if (out.nonEmpty) Some(out) else None
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** REAL MP4 demuxer through the [[VideoDemuxer]] seam: MJPEG-in-MP4
    * (ISO/IEC 14496-12 ISO base media file format, the public spec).
    * Boxes are [u32 size BE][fourcc]; the sample tables under
    * moov/trak/mdia/minf/stbl locate every sample: `stsd` declares the
    * codec (accepted: 'jpeg'/'mjpa'/'mjpb' — each sample a standalone
    * JPEG the JDK can decode), `stsz` the sample sizes, `stsc` the
    * samples-per-chunk runs, `stco`/`co64` the chunk file offsets.
    * Frames re-encode as PNG, the payload contract downstream decoders
    * expect. VP8/H.264-in-MP4 still has no JDK decoder — those payloads
    * correctly return None here and fall through. Not auto-registered:
    * `registerVideoDemuxer(MjpegMp4Demuxer)` on the driver. */
  object MjpegMp4Demuxer extends VideoDemuxer {
    private def fourcc(b: Array[Byte], off: Long): String =
      if (off < 0 || off + 4 > b.length) ""
      else new String(b, off.toInt, 4,
        java.nio.charset.StandardCharsets.US_ASCII)

    private def u32be(b: Array[Byte], off: Long): Long = {
      val o = off.toInt
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }

    private def u64be(b: Array[Byte], off: Long): Long =
      (u32be(b, off) << 32) | u32be(b, off + 4)

    def canDemux(content: Array[Byte]): Boolean =
      content.length >= 12 && fourcc(content, 4) == "ftyp"

    /** Find the first child box named `name` inside [start, end);
      * returns (payloadStart, payloadEnd). */
    private def findBox(b: Array[Byte], start: Long, end: Long,
        name: String): Option[(Long, Long)] = {
      var off = start
      while (off + 8 <= end) {
        val sz0 = u32be(b, off)
        val id = fourcc(b, off + 4)
        val (hdr, sz) =
          if (sz0 == 1 && off + 16 <= end) (16L, u64be(b, off + 8))
          else if (sz0 == 0) (8L, end - off)
          else (8L, sz0)
        if (sz < hdr) return None // corrupt size: stop walking
        if (id == name) return Some((off + hdr, math.min(off + sz, end)))
        off += sz
      }
      None
    }

    def demux(content: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
      try {
        val fileEnd = content.length.toLong
        val moov = findBox(content, 0, fileEnd, "moov").getOrElse {
          return None
        }
        // walk every trak; use the first whose stsd codec is JPEG-ish
        var trakStart = moov._1
        while (trakStart < moov._2) {
          findBox(content, trakStart, moov._2, "trak") match {
            case None => trakStart = moov._2
            case Some((ts, te)) =>
              val stbl = for {
                md <- findBox(content, ts, te, "mdia")
                mi <- findBox(content, md._1, md._2, "minf")
                st <- findBox(content, mi._1, mi._2, "stbl")
              } yield st
              val jpegish = stbl.flatMap { case (ss, se) =>
                findBox(content, ss, se, "stsd").flatMap {
                  case (ds, de) =>
                    // ver/flags(4) + entry_count(4) + [size(4) format(4)]
                    if (ds + 16 > de) None
                    else {
                      val fmt = fourcc(content, ds + 12)
                      if (Set("jpeg", "mjpa", "mjpb")(fmt))
                        Some((ss, se))
                      else None
                    }
                }
              }
              jpegish match {
                case Some((ss, se)) =>
                  return demuxTrack(content, ss, se)
                case None =>
                  // skip past this trak, look for the next one
                  trakStart = te
              }
          }
        }
        None
      } catch {
        case scala.util.control.NonFatal(_) => None
      }

    private def demuxTrack(b: Array[Byte], stblStart: Long,
        stblEnd: Long): Option[IndexedSeq[Array[Byte]]] = {
      val (szS, szE) = findBox(b, stblStart, stblEnd, "stsz")
        .getOrElse(return None)
      val fixedSize = u32be(b, szS + 4)
      val nSamples = u32be(b, szS + 8).toInt
      val sizes: Int => Long =
        if (fixedSize != 0) _ => fixedSize
        else i => u32be(b, szS + 12 + 4L * i)
      val (scS, scE) = findBox(b, stblStart, stblEnd, "stsc")
        .getOrElse(return None)
      val nRuns = u32be(b, scS + 4).toInt
      val runs = (0 until nRuns).map { i =>
        (u32be(b, scS + 8 + 12L * i), // first_chunk (1-based)
          u32be(b, scS + 12 + 12L * i)) // samples_per_chunk
      }
      val (offsets, nChunks) =
        findBox(b, stblStart, stblEnd, "stco") match {
          case Some((coS, _)) =>
            val n = u32be(b, coS + 4).toInt
            ((i: Int) => u32be(b, coS + 8 + 4L * i), n)
          case None =>
            val (coS, _) = findBox(b, stblStart, stblEnd, "co64")
              .getOrElse(return None)
            val n = u32be(b, coS + 4).toInt
            ((i: Int) => u64be(b, coS + 8 + 8L * i), n)
        }
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      var sample = 0
      var chunk = 0
      while (chunk < nChunks && sample < nSamples) {
        // samples in this chunk = the last stsc run whose first_chunk
        // covers it (runs are ascending by first_chunk)
        val spc = runs.takeWhile(_._1 <= chunk + 1).lastOption
          .map(_._2.toInt).getOrElse(0)
        var off = offsets(chunk)
        var k = 0
        while (k < spc && sample < nSamples) {
          val sz = sizes(sample)
          if (off + sz <= b.length && sz >= 2 &&
            (b(off.toInt) & 0xff) == 0xff &&
            (b(off.toInt + 1) & 0xff) == 0xd8) {
            val jpeg = java.util.Arrays.copyOfRange(b, off.toInt,
              (off + sz).toInt)
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(jpeg))
            if (img != null) {
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", out)
              frames += out.toByteArray
            }
          }
          off += sz
          sample += 1
          k += 1
        }
        chunk += 1
      }
      val out = frames.result()
      if (out.nonEmpty) Some(out) else None
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame becomes a
    * frame row. Demux resolution order per payload: (1) registered
    * [[VideoDemuxer]]s (the MP4/WebM seam), (2) the built-in ImageIO
    * sequence reader — REAL demux for animated GIF (frame count and
    * pixels come from the container, emitted as standalone PNGs),
    * (3) the deterministic stub chunking of the payload by declared
    * `n_frames`, which keeps the pipeline shape testable with
    * synthetic bytes. Generator shape either way: one input row →
    * many frame rows. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      stride: Int = 2): Dataset[VideoFrame] = {
    import spark.implicits._
    val plugged = videoDemuxers // snapshot into the task closure
    media.filter(_.media_type == "video").flatMap { m =>
      plugged.iterator
        .filter(_.canDemux(m.content))
        .map(_.demux(m.content))
        .collectFirst { case Some(fs) => fs }
        .orElse(VideoCodec.decodeFrames(m.content)) match {
        case Some(frames) =>
          (0 until frames.length by stride).map(f =>
            VideoFrame(m.media_id, f, frames(f)))
        case None =>
          val frameSize =
            math.max(1, m.content.length / math.max(m.n_frames, 1))
          (0 until m.n_frames by stride).map { f =>
            val from = f * frameSize
            val until = math.min(m.content.length, from + frameSize)
            VideoFrame(m.media_id, f,
              java.util.Arrays.copyOfRange(m.content, from, until))
          }
      }
    }
  }

  /** Exact-dup groups over media payloads (content hash; the binary
    * analogue of text exact dedup). */
  def exactDupGroups(media: DataFrame): DataFrame =
    media.groupBy(sha2(col("content"), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("media_id").as("keep_id"))

  /** Near-dup candidates over the extracted embeddings via SRP-sketch
    * banding: sketch each feature vector (64-bit, codegen kernel), bucket
    * on 16-bit sketch chunks (inverted index, same shape as text LSH —
    * never an all-pairs join), then confirm candidates with the exact
    * cosine. Candidates missed by banding are pairs with sketch Hamming
    * > 3 — for `threshold` ≥ ~0.95 the SRP disagreement rate makes that
    * loss negligible, the standard LSH recall trade. `maxBucket` drops
    * hyper-hot sketch buckets (near-constant payloads — blank pages,
    * silence — whose features collapse onto one sketch) before the
    * quadratic pair expansion; the cap DEFAULTS ON (4096, matching
    * [[Phash.videoNearDup]]) because a real media corpus always
    * contains those degenerate payloads — pass None only for curated
    * inputs where uncapped completeness is genuinely wanted. */
  def nearDupCandidates(spark: SparkSession, media: Dataset[MediaRow],
      threshold: Double = 0.95, dim: Int = 64,
      maxBucket: Option[Int] = Some(4096)): DataFrame = {
    val feats = extractFeatures(spark, media, dim).toDF()
    val sk = feats.select(col("media_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("sketch",
        graft.functions.Expressions.srpSketch64(col("v"), dim))
    Dedup.bandCandidates64(sk.select(col("id"), col("v"), col("sketch")),
        "sketch", Seq("v"), maxBucket)
      .select(col("a.id").as("id_a"), col("a.v").as("va"),
        col("b.id").as("id_b"), col("b.v").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
