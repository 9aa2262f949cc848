package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._
import org.apache.spark.sql.functions._

/** Phash kernels pinned bit-for-bit: aHash/dHash on hand-computed
  * grids (1×1 cells, so every bit is a single hand-checkable compare),
  * quantize24 exactness, hammingCandidates ≡ brute-force Hamming, and
  * the perceptual end-to-end through the REAL image decoder — a
  * re-encoded (JPEG) and a resized copy stay within a small Hamming
  * radius of the original while an unrelated image does not.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  /** 8×8 image, 1 px per aHash cell: bit k ⟺ 64·px[k] > Σpx. */
  test("aHash64 bit-exact on an 8x8 image (one pixel per cell)") {
    val px = Array.tabulate(64)(i => ((i * 37 + 11) % 100).toLong)
    val total = px.sum
    var expected = 0L
    for (k <- 0 until 64)
      if (64 * px(k) > total) expected |= (1L << k)
    val got = Seq(Tuple1(px)).toDF("lv")
      .select(Phash.aHash64("lv", 8, 8).as("h")).head().getLong(0)
    assert(got == expected,
      f"aHash mismatch: got $got%016x expected $expected%016x")
  }

  /** 16×16 image, 2×2 cells: bit k ⟺ 64·cellSum(k) > Σpx — checks the
    * row-major pooling index arithmetic (the off-by-one hotspot). */
  test("aHash64 pools 2x2 cells correctly on a 16x16 image") {
    val w = 16
    val px = Array.tabulate(256)(i => ((i * 101 + 7) % 255).toLong)
    val total = px.sum
    def cell(c: Int): Long = {
      val cy = c / 8; val cx = c % 8
      (for (dy <- 0 to 1; dx <- 0 to 1)
        yield px((cy * 2 + dy) * w + cx * 2 + dx)).sum
    }
    var expected = 0L
    for (k <- 0 until 64) if (64 * cell(k) > total) expected |= (1L << k)
    val got = Seq(Tuple1(px)).toDF("lv")
      .select(Phash.aHash64("lv", 16, 16).as("h")).head().getLong(0)
    assert(got == expected)
  }

  /** 9×8 image, 1 px per dHash cell: bit r·8+c ⟺ px[r·9+c] > px[r·9+c+1].
    * Fixture has every compare outcome: >, <, ==(no bit). */
  test("dHash64 bit-exact on a 9x8 image (one pixel per cell)") {
    val px = Array.tabulate(72)(i => ((i * 53 + 29) % 90).toLong)
    px(10) = px(11) // plant a tie: strict > must NOT set the bit
    var expected = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (px(r * 9 + c) > px(r * 9 + c + 1))
        expected |= (1L << (r * 8 + c))
    val got = Seq(Tuple1(px)).toDF("lv")
      .select(Phash.dHash64("lv", 9, 8).as("h")).head().getLong(0)
    assert(got == expected,
      f"dHash mismatch: got $got%016x expected $expected%016x")
  }

  test("quantize24 is an exact exponent shift (no float rounding)") {
    val got = Seq(Tuple1(Array(0f, 0.5f, 1f, 0.25f, 1f / 3f)))
      .toDF("px").select(Phash.quantize24(col("px")).as("lv"))
      .head().getSeq[Long](0)
    assert(got(0) == 0L && got(1) == 8388608L && got(2) == 16777216L &&
      got(3) == 4194304L)
    // arbitrary float: floor(px * 2^24) computed in double is exact
    // because the float mantissa (24 bits) shifts inside the double's 53
    assert(got(4) == math.floor((1f / 3f).toDouble * 16777216.0).toLong)
  }

  /** hammingCandidates over a planted hash population must equal
    * brute-force Hamming ≤ 3: distance 1/2/3 pairs found (including a
    * distance-3 pair whose flips span three different 16-bit bands —
    * the pigeonhole's worst case), the distance-4 pair excluded even
    * though it still shares an exact band. */
  test("hammingCandidates equals brute force at maxDist 3") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val base = Array.tabulate(20)(i => mix(i.toLong * 7919))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    base.zipWithIndex.foreach { case (h, i) => rows += ((i.toLong, h)) }
    // planted variants of base(0): distances 1, 3 (across 3 bands), 4
    rows += ((100L, base(0) ^ (1L << 5)))
    rows += ((101L, base(0) ^ (1L << 3) ^ (1L << 20) ^ (1L << 40)))
    rows += ((102L, base(0) ^ (1L << 0) ^ (1L << 16) ^ (1L << 32)
      ^ (1L << 48)))
    val df = rows.toSeq.toDF("id", "ph")
    val got = Phash.hammingCandidates(df, "id", "ph", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute, s"got $got expected $brute")
    // the plants are actually exercised
    assert(brute.contains((0L, 100L, 1L)) && brute.contains((0L, 101L, 3L)))
    assert(!brute.exists { case (a, b, _) => a == 0L && b == 102L })
  }

  /** The codegen kernels must equal the SQL-HOF formulations (which the
    * q155 DuckDB oracle replays) bit-for-bit on random images. */
  test("aHash64/dHash64 kernels equal the HOF formulations") {
    val rnd = new scala.util.Random(7)
    val imgs = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(256)(rnd.nextInt(1 << 24).toLong),
        Array.fill(288)(rnd.nextInt(1 << 24).toLong)))
      .toDF("id", "lv_a", "lv_d")
    val r = imgs.select(
      Phash.aHash64("lv_a", 16, 16).as("ka"),
      Phash.aHash64Hof("lv_a", 16, 16).as("ha"),
      Phash.dHash64("lv_d", 18, 16).as("kd"),
      Phash.dHash64Hof("lv_d", 18, 16).as("hd")).collect()
    r.foreach { row =>
      assert(row.getLong(0) == row.getLong(1), "aHash kernel != HOF")
      assert(row.getLong(2) == row.getLong(3), "dHash kernel != HOF")
    }
  }

  /** The energyProfile64 codegen kernel must equal the SQL-HOF
    * formulation (which the q162 DuckDB oracle replays) bit-for-bit on
    * random float signals — including n < 64 (empty segments profile
    * as 0), the boundary lengths around 64, and the empty signal. */
  test("energyProfile64 kernel equals the HOF formulation") {
    val rnd = new scala.util.Random(11)
    val sigs = (Seq(0, 1, 63, 64, 65) ++ Seq.fill(30)(rnd.nextInt(2000)))
      .zipWithIndex.map { case (n, i) =>
        (i.toLong, Array.fill(n)(rnd.nextFloat() * 2f - 1f))
      }
    val r = sigs.toDF("id", "smp").select(
      graft.functions.Expressions.energyProfile64(col("smp")).as("k"),
      Phash.energyProfile64Hof("smp").as("h")).collect()
    r.foreach { row =>
      assert(row.getSeq[Long](0) == row.getSeq[Long](1),
        "energyProfile64 kernel != HOF")
      assert(row.getSeq[Long](0).size == 64)
    }
  }

  /** Contract violations must fail LOUDLY: the kernels index the level
    * array positionally, so a wrong-length array would otherwise read
    * out of bounds and hash garbage silently. */
  test("aHash64/dHash64 reject arrays that do not match w*h") {
    def rootMsg(t: Throwable): String = {
      var e = t
      while (e.getCause != null) e = e.getCause
      String.valueOf(e.getMessage)
    }
    val short = Seq(Tuple1(Array.fill(63)(1L))).toDF("lv")
    val ea = intercept[Exception] {
      short.select(Phash.aHash64("lv", 8, 8)).collect()
    }
    assert(rootMsg(ea).contains("pixel levels"), rootMsg(ea))
    val long9 = Seq(Tuple1(Array.fill(100)(1L))).toDF("lv")
    val ed = intercept[Exception] {
      long9.select(Phash.dHash64("lv", 9, 8)).collect()
    }
    assert(rootMsg(ed).contains("pixel levels"), rootMsg(ed))
  }

  /** The video path's maxBucket DEFAULT is the safe one: a blank-frame
    * blob bigger than the default cap (4096 entries in one band
    * bucket) is dropped at the index — no quadratic expansion ever
    * materializes — while genuinely matching textured frames still
    * pair. Exact pigeonhole completeness is opt-in via None. */
  test("frameLevelNearDup drops a >4096 blank-frame bucket by default") {
    val blank = Array.fill(64)(5000L)
    def tex(seed: Long) =
      Array.tabulate(64)(i => (seed * 31 + i * 104729L) % 50000)
    // 2050 videos x 2 blank frames = 4100 colliding entries per band
    val blanks = (0L until 2050L).flatMap(v =>
      Seq((v, 0, blank), (v, 1, blank)))
    val texd = Seq((9000001L, 0, tex(7)), (9000001L, 1, tex(8)),
      (9000002L, 0, tex(7)), (9000002L, 1, tex(8)))
    val frames = (blanks ++ texd).toDF("media_id", "frame_idx", "lv")
    val got = Phash.frameLevelNearDup(frames, 8, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // ONLY the textured pair survives — every blank-blob pair is gone
    // (tex(7)/tex(8) differ by a constant shift, so cross-frame pairs
    // also land within distance 3: 4 shared frame pairs, not 2)
    assert(got.keySet == Set((9000001L, 9000002L)), s"got $got")
    assert(got.head._2 >= 2L)
  }

  /** The hot-bucket guard: identical hashes (the blank-page/black-frame
    * shape) collide into single band buckets that would expand
    * quadratically; maxBucket drops them while distinct near-dups keep
    * pairing. */
  test("hammingCandidates maxBucket drops hyper-hot buckets only") {
    val rows = (0L until 40L).map(i => (i, 0xDEADBEEFL)) ++ // 40 clones
      Seq((100L, 0x1234L), (101L, 0x1234L ^ (1L << 7))) // distance-1 pair
    val df = rows.toDF("id", "ph")
    val uncapped = Phash.hammingCandidates(df, "id", "ph", maxDist = 3)
    assert(uncapped.count() == 40L * 39 / 2 + 1)
    val capped = Phash
      .hammingCandidates(df, "id", "ph", maxDist = 3, maxBucket = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the clone blob is gone, the genuine near-dup pair survives
    assert(capped == Set((100L, 101L)))
  }

  /** A real 8-bit grayscale PNG (JDK writer) with caller-chosen pixels. */
  private def grayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y) & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def jpegBytes(png: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** End-to-end perceptual claim through the REAL decoder: byte-level
    * contentHash separates all four copies, while aHash keeps the
    * re-encoded (JPEG) and resized (32→16 nearest-neighbour) copies
    * within a small Hamming radius of the original and pushes the
    * unrelated image far away. */
  test("re-encoded and resized near-dups survive aHash through decode") {
    // a smooth-ish deterministic texture (not a pure ramp: cells differ)
    def tex(x: Int, y: Int): Int = ((x * 13 + y * 29 + (x * y) % 7) % 251)
    val orig = grayPng(16, 16, tex)
    val jpeg = jpegBytes(orig)
    // 32x32 pixel-doubled copy: nearest-neighbour resize recovers the
    // 16x16 exactly, modulo the +1 noise planted on a few pixels
    val big = grayPng(32, 32, (x, y) =>
      tex(x / 2, y / 2) + (if ((x * 31 + y) % 97 == 0) 1 else 0))
    val unrelated = grayPng(16, 16, (x, y) => ((x * 199 + y * 83) % 256))
    val media = Seq(
      MediaRow(1, "image", orig, 16, 16, 0, 0),
      MediaRow(2, "image", jpeg, 16, 16, 0, 0),
      MediaRow(3, "image", big, 32, 32, 0, 0),
      MediaRow(4, "image", unrelated, 16, 16, 0, 0)).toDS()
    val decoded = Multimodal.decodeImages(spark, media)
    val small = decoded.filter(_.width == 16)
      .union(Multimodal.resize(spark,
        decoded.filter(_.width == 32), 16, 16))
    val hashes = small.toDF()
      .select(col("media_id"),
        Phash.quantize24(col("pixels")).as("lv"))
      .select(col("media_id"), Phash.aHash64("lv", 16, 16).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(2L)) <= 6,
      s"jpeg re-encode drifted ${ham(hashes(1L), hashes(2L))} bits")
    assert(ham(hashes(1L), hashes(3L)) <= 4,
      s"resize drifted ${ham(hashes(1L), hashes(3L))} bits")
    assert(ham(hashes(1L), hashes(4L)) >= 12,
      s"unrelated image only ${ham(hashes(1L), hashes(4L))} bits away")
    // byte hashes separate ALL of them — the reason phash exists
    val ch = Seq(orig, jpeg, big).map(FakeCodec.contentHash).toSet
    assert(ch.size == 3)
  }

  /** 16-bit little-endian PCM WAV through the JDK's own writer. */
  private def wav16(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1,
      true, false)
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The SAME signal re-quantized to 8-bit unsigned PCM. */
  private def wav8(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 8, 1,
      false, false)
    val raw = samples.map(s => ((s / 256) + 128).toByte)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Volume-invariant audio fingerprint through the REAL audio codec:
    * an 8-bit re-quantization and a half-volume copy of the same
    * signal stay within a small Hamming radius of the 16-bit original
    * (exactly 0 for the pure gain change at these amplitudes), while a
    * different amplitude envelope lands far away. */
  test("audioFingerprint survives re-quantization and volume changes") {
    // 8000 samples = 64 segments x 125; loud/quiet alternating envelope
    val base = Array.tabulate(8000) { i =>
      val loud = (i / 125) % 2 == 0
      val amp = if (loud) 12000 else 400
      (if (i % 2 == 0) amp else -amp).toShort
    }
    val half = base.map(s => (s / 2).toShort)
    val ramp = Array.tabulate(8000)(i =>
      (((i * 4) % 24000 - 12000) / 2).toShort) // rising-sawtooth envelope
    val media = Seq(
      MediaRow(1, "audio", wav16(base), 0, 0, 16000, 0),
      MediaRow(2, "audio", wav8(base), 0, 0, 16000, 0),
      MediaRow(3, "audio", wav16(half), 0, 0, 16000, 0),
      MediaRow(4, "audio", wav16(ramp), 0, 0, 16000, 0)).toDS()
    val fps = Phash.audioFingerprint(spark, media)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps.size == 4)
    // the 32 loud segments are exactly the above-mean ones
    assert(java.lang.Long.bitCount(fps(1L)) == 32)
    assert(ham(fps(1L), fps(2L)) <= 2,
      s"8-bit re-quantization drifted ${ham(fps(1L), fps(2L))} bits")
    assert(ham(fps(1L), fps(3L)) == 0,
      s"pure volume change drifted ${ham(fps(1L), fps(3L))} bits")
    assert(ham(fps(1L), fps(4L)) >= 12,
      s"unrelated envelope only ${ham(fps(1L), fps(4L))} bits away")
    // byte identity separates all four containers
    assert(Seq(wav16(base), wav8(base), wav16(half), wav16(ramp))
      .map(FakeCodec.contentHash).toSet.size == 4)
  }

  /** An animated GIF whose frame i carries texture `tex(x, y, i)`,
    * through the JDK's own sequence writer. */
  private def texturedGif(n: Int, w: Int, h: Int,
      tex: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until n) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, tex(x, y, i) & 0xff)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    out.toByteArray
  }

  /** Frame-sampled video near-dup end-to-end through the REAL GIF
    * demuxer: a re-encoded copy of the same frame textures pairs with
    * the original (every byte differs — `contentHash` separates them),
    * a different-texture video does not, and the deterministic
    * fallback path (non-demuxable bytes) pairs exact payload copies. */
  test("videoNearDup pairs re-encoded GIFs and separates unrelated ones") {
    def texA(x: Int, y: Int, i: Int) = (x * 17 + y * 31 + i * 53) % 241
    def texB(x: Int, y: Int, i: Int) = (x * 201 + y * 97 + i * 11) % 251
    val gifA = texturedGif(6, 16, 16, texA)
    // re-encode: same textures, frames written in a SECOND gif (extra
    // trailing frame changes the byte stream beyond the shared prefix)
    val gifA2 = texturedGif(7, 16, 16, texA)
    val gifB = texturedGif(6, 16, 16, texB)
    val rawC = Array.tabulate(1200)(i => ((42 * 31 + i * 7) % 251).toByte)
    val media = Seq(
      MediaRow(1, "video", gifA, 16, 16, 0, 6),
      MediaRow(2, "video", gifA2, 16, 16, 0, 7),
      MediaRow(3, "video", gifB, 16, 16, 0, 6),
      MediaRow(4, "video", rawC, 16, 16, 0, 6), // fallback chunking
      MediaRow(5, "video", rawC.clone(), 16, 16, 0, 6)).toDS()
    assert(FakeCodec.contentHash(gifA) != FakeCodec.contentHash(gifA2))
    val pairs = Phash.videoNearDup(spark, media, stride = 2,
        maxDist = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.contains((1L, 2L)),
      s"re-encoded copy did not pair: $pairs")
    assert(pairs((1L, 2L)) >= 3) // frames 0,2,4 all match
    assert(pairs.contains((4L, 5L)), "fallback exact copies did not pair")
    assert(!pairs.keySet.exists { case (a, b) =>
      (a == 3L || b == 3L) && a != b
    }, s"unrelated video paired: $pairs")
  }
}
