package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload columns, typed metadata decode
  * (stubbed codec), feature extraction, frame sampling. The Spark-side
  * mechanics (schema, partition-local decode, explode shapes) are the
  * thing under test.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Tables.documents(spark, sf).limit(100)
    .select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))

  test("decodeMeta adds a typed meta struct, deterministic across runs") {
    val a = Multimodal.decodeMeta(media).select("media_id", "meta.*")
    assert(a.schema.fieldNames.toSeq ==
      Seq("media_id", "width", "height", "n_frames", "ok"))
    assert(a.filter(col("ok") && col("width") > 0 && col("height") > 0).count() == 100)
    val b = Multimodal.decodeMeta(media).select("media_id", "meta.*")
    assert(a.exceptAll(b).count() == 0, "decode must be deterministic")
  }

  test("extractFeatures emits fixed-width vectors usable by Similarity") {
    val feats = Multimodal.extractFeatures(media, dim = 16)
      .select(col("media_id").as("vec_id"), col("features"))
    assert(feats.filter(size(col("features")) === 16).count() == 100)
    val top = graft.ops.Similarity.bruteForceTopK(
      feats.filter(col("vec_id") < 3), feats, "vec_id", "features", 2)
    assert(top.count() == 6) // 3 queries x k=2
  }

  test("sampleFrames emits about n evenly spaced frames per row") {
    val sampled = Multimodal.sampleFrames(Multimodal.decodeMeta(media), n = 4)
    val perRow = sampled.groupBy("media_id").agg(count(lit(1)).as("k"))
    assert(perRow.count() == 100)
    // step = max(1, n_frames/4) → between 1 and ~5 samples per row
    assert(perRow.filter(col("k") < 1 || col("k") > 8).count() == 0)
    val bad = sampled.filter(col("frame_idx") < 0 ||
      col("frame_idx") >= col("meta.n_frames")).count()
    assert(bad == 0)
  }

  test("audioWindows: window grid, partial tail, RMS and zero crossings") {
    import spark.implicits._
    // 5 bytes: '@'=64 → 0, ' '=32 → -32, 'x'=120 → 56 ...
    val m = Seq((1L, "@ x @ ")).toDF("media_id", "txt")
      .select(col("media_id"), col("txt").cast("binary").as("payload"))
    val w = graft.ops.Multimodal.audioWindows(m, window = 4)
      .orderBy("w_idx").collect()
    assert(w.length == 2, s"6 samples / window 4 → full + partial")
    assert(w(0).getAs[Int]("n_samples") == 4 &&
      w(1).getAs[Int]("n_samples") == 2)
    // window 0 samples: 0, -32, 56, -32 → crossings at every pair
    // (0 is non-negative, so (0,-32) crosses too); rms = √(5184/4) = 36
    assert(w(0).getAs[Int]("zc") == 3, w(0).toString)
    assert(w(0).getAs[Double]("rms") == 36.0)
    // empty payload → zero windows
    val empty = Seq((2L, "")).toDF("media_id", "txt")
      .select(col("media_id"), col("txt").cast("binary").as("payload"))
    assert(graft.ops.Multimodal.audioWindows(empty).isEmpty)
  }

  test("Codecs.parseWav: synth round-trip, LIST-chunk skipping, corruption → None") {
    import graft.ops.Codecs
    for (seed <- Seq(0L, 1L, 2L, 5L, 7L, 10L, 49L, 123L)) { // 0,5,10: LIST chunk
      val bytes = Codecs.synthWav(seed)
      val m = Codecs.parseWav(bytes).get
      assert(m.channels == 1 + (seed % 2).toInt, s"seed=$seed")
      assert(m.sampleRate == 8000 + ((seed % 3) * 4000).toInt)
      assert(m.bitsPerSample == 16)
      assert(m.nFrames == 16 + (seed % 50).toInt)
      val pcm = Codecs.decodeWavPcm16(bytes)
      assert(pcm.length == m.nFrames * m.channels)
      for (j <- pcm.indices) {
        val i = j / m.channels; val c = j % m.channels
        val want = ((((seed * 31 + i * 7 + c * 13) % 256) - 128) * 64).toInt
        assert(pcm(j) == want, s"seed=$seed sample $j: ${pcm(j)} != $want")
      }
    }
    val good = Codecs.synthWav(3L)
    assert(Codecs.parseWav(good.take(10)) == None, "truncated header")
    assert(Codecs.parseWav(good.dropRight(5)) == None, "truncated data chunk")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Codecs.parseWav(badMagic) == None, "bad RIFF magic")
    // non-PCM format code (offset 20 = fmt body start, u16 audioFormat)
    val floatFmt = good.clone(); floatFmt(20) = 3
    assert(Codecs.parseWav(floatFmt) == None, "non-PCM must be rejected")
    assert(Codecs.parseWav(null) == None && Codecs.parseWav(Array[Byte]()) == None)
  }

  test("Codecs.bmpDHash: formula replay, 1-pixel flip budget, row-order invariance, corruption") {
    import graft.ops.Codecs
    // replay the documented synthBmpNear → dHash formula (18×16 image,
    // px = 2gx / py = 2gy sampling, integer ITU-601 luma)
    def gray(s: Long, pert: Int, gx: Int, gy: Int): Long = {
      def pix(k: Int): Long = {
        val i = s + 1000003L * (2 * gx + 36 * gy + 288 * k)
        val v = ((i * i) >> 20) % 256
        if (gx == 0 && gy == 0 && k == 0) (v + pert) % 256 else v
      }
      114 * pix(0) + 587 * pix(1) + 299 * pix(2)
    }
    def refHash(s: Long, pert: Int): Long = {
      var h = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if (gray(s, pert, gx + 1, gy) > gray(s, pert, gx, gy))
          h |= 1L << (gy * 8 + gx)
      h
    }
    for (seed <- Seq(0L, 7L, 42L, 199L)) {
      assert(Codecs.bmpDHash(Codecs.synthBmpNear(seed, 0)) == refHash(seed, 0),
        s"seed=$seed dHash formula replay")
      val d = java.lang.Long.bitCount(
        Codecs.bmpDHash(Codecs.synthBmpNear(seed, 128)) ^
          Codecs.bmpDHash(Codecs.synthBmpNear(seed, 0)))
      assert(d <= 1, s"seed=$seed: 1-pixel perturbation flipped $d dHash bits")
    }
    // the hash is a function of DISPLAY pixels, not file layout: the same
    // image re-encoded top-down (negative height, rows in display order)
    // must hash identically
    val bu = Codecs.synthBmpNear(5, 0)
    val td = bu.clone()
    for (i <- 0 until 4) td(22 + i) = (((-16) >> (8 * i)) & 0xFF).toByte
    val rowSize = 56
    for (r <- 0 until 16; b <- 0 until rowSize)
      td(54 + r * rowSize + b) = bu(54 + (15 - r) * rowSize + b)
    assert(Codecs.bmpDHash(td) == Codecs.bmpDHash(bu),
      "top-down re-encoding must produce the identical dHash")
    // corruption → null, never a throw or a degenerate shared hash
    assert(Codecs.bmpDHash(null) == null)
    assert(Codecs.bmpDHash(bu.take(40)) == null, "truncated header")
    assert(Codecs.bmpDHash(bu.dropRight(3)) == null, "truncated pixel array")
    val badMagic = bu.clone(); badMagic(0) = 'X'.toByte
    assert(Codecs.bmpDHash(badMagic) == null)
  }

  test("Codecs.resizeBmp24: exact box means, re-encode round-trip, crop, top-down, corruption") {
    import graft.ops.Codecs
    val src = Codecs.synthBmpNear(7, 0) // 18×16
    def pix(x: Int, y: Int, k: Int): Long = {
      val i = 7 + 1000003L * (x + 18 * y + 288 * k)
      ((i * i) >> 20) % 256
    }
    val half = Codecs.resizeBmp24(src, 2)
    val m = Codecs.parseBmp(half).get
    assert(m.width == 9 && m.height == 8 && m.bitsPerPixel == 24)
    // exact box means: pixel sum of the output equals the formula replay
    val want = (for (oy <- 0 until 8; ox <- 0 until 9; k <- 0 until 3) yield
      (pix(2 * ox, 2 * oy, k) + pix(2 * ox + 1, 2 * oy, k) +
        pix(2 * ox, 2 * oy + 1, k) + pix(2 * ox + 1, 2 * oy + 1, k)) / 4).sum
    assert(Codecs.bmpPixelSum(half) == want, "box-mean pixel sum")
    // the re-encoded output is a first-class BMP: the dHash chain works
    assert(Codecs.bmpDHash(half) != null)
    // non-dividing factor crops the remainder (18/4 = 4, 16/4 = 4)
    val q = Codecs.parseBmp(Codecs.resizeBmp24(src, 4)).get
    assert(q.width == 4 && q.height == 4)
    // a top-down source resizes to the same image as its bottom-up twin
    val td = src.clone()
    for (i <- 0 until 4) td(22 + i) = (((-16) >> (8 * i)) & 0xFF).toByte
    val rowSize = 56
    for (r <- 0 until 16; b <- 0 until rowSize)
      td(54 + r * rowSize + b) = src(54 + (15 - r) * rowSize + b)
    assert(java.util.Arrays.equals(Codecs.resizeBmp24(td, 2), half),
      "top-down input must resize to the identical output")
    // corruption / degenerate output
    assert(Codecs.resizeBmp24(null, 2) == null)
    assert(Codecs.resizeBmp24(src.take(40), 2) == null)
    assert(Codecs.resizeBmp24(src, 32) == null, "zero output dims must be rejected")
  }

  test("Codecs.parseAvi/aviPixelSum/aviKeyframeDHash: round-trip, formula replay, corruption") {
    import graft.ops.Codecs
    for (seed <- Seq(0L, 3L, 7L, 500042L)) {
      val bytes = Codecs.synthAviNear(seed, 0)
      val m = Codecs.parseAvi(bytes).get
      val nf = (4 + seed % 5).toInt
      assert(m.width == 18 && m.height == 16 && m.nFrames == nf
        && m.usPerFrame == 33333L * (1 + seed % 3)
        && m.frameOffsets.length == nf, s"seed=$seed header round-trip")
      // pixel-sum formula replay (padding excluded, all frames)
      val want = (for (f <- 0 until nf; y <- 0 until 16; x <- 0 until 18;
                       k <- 0 until 3) yield {
        val i = seed % 1000000 + 1000003L * (x + 18 * y + 288 * k) + 7777777L * f
        ((i * i) >> 20) % 256
      }).sum
      assert(Codecs.aviPixelSum(bytes) == want, s"seed=$seed pixel sum")
      // keyframe dHash: equals the BMP dHash of the same frame-0 pixels
      assert(Codecs.aviKeyframeDHash(bytes) ==
        Codecs.bmpDHash(Codecs.synthBmpNear(seed, 0)),
        s"seed=$seed: frame 0 must hash like the equivalent bitmap")
      val d = java.lang.Long.bitCount(
        Codecs.aviKeyframeDHash(Codecs.synthAviNear(seed, 128)) ^
          Codecs.aviKeyframeDHash(bytes))
      assert(d <= 1, s"seed=$seed: 1-pixel frame-0 edit flipped $d bits")
    }
    // corruption → None/null/-1, never a throw
    val good = Codecs.synthAviNear(9, 0)
    val badMagic = good.clone(); badMagic(8) = 'X'.toByte
    assert(Codecs.parseAvi(badMagic) == None)
    assert(Codecs.parseAvi(good.take(40)) == None, "truncated container")
    assert(Codecs.aviKeyframeDHash(null) == null)
    assert(Codecs.aviPixelSum(good.dropRight(3)) == -1L, "truncated final frame")
    // header/payload mismatch: lie about dwTotalFrames
    val lied = good.clone()
    // 12 RIFF hdr + 8 LIST tag/size + 4 'hdrl' + 8 'avih' tag/size + 16
    lied(48) = 99.toByte // avih dwTotalFrames low byte
    assert(Codecs.parseAvi(lied) == None, "frame-count mismatch must be rejected")
  }

  test("Codecs.wavFingerprint: formula replay, 1-sample flip budget, corruption") {
    import graft.ops.Codecs
    // replay the documented synthWavNear → fingerprint formula
    def refFp(s: Long, pert: Int): Long = {
      def sample(j: Int): Long = {
        val i = s + 1000003L * j
        val v = ((i * i) >> 20) % 4096 - 2048
        if (j == 0) ((v + 2048 + pert) % 4096) - 2048 else v
      }
      val e = (0 until 65).map(w =>
        (32 * w until 32 * w + 32).map(j => sample(j) * sample(j)).sum)
      (0 until 64).foldLeft(0L)((h, b) =>
        if (e(b + 1) > e(b)) h | (1L << b) else h)
    }
    for (seed <- Seq(0L, 7L, 42L, 199L)) {
      assert(Codecs.wavFingerprint(Codecs.synthWavNear(seed, 0)) == refFp(seed, 0),
        s"seed=$seed fingerprint formula replay")
      val d = java.lang.Long.bitCount(
        Codecs.wavFingerprint(Codecs.synthWavNear(seed, 1024)) ^
          Codecs.wavFingerprint(Codecs.synthWavNear(seed, 0)))
      assert(d <= 1, s"seed=$seed: 1-sample perturbation flipped $d bits")
    }
    // the fingerprint reads DECODED samples, so the LIST-chunk layout
    // variant of the same PCM must hash identically: synthWav corpus
    // files are too short (< 65 samples) and must return null instead
    // of a degenerate shared hash
    assert(Codecs.wavFingerprint(Codecs.synthWav(5)) == null,
      "sub-65-sample files must be rejected, not degenerate")
    assert(Codecs.wavFingerprint(null) == null)
    val good = Codecs.synthWavNear(5, 0)
    assert(Codecs.wavFingerprint(good.take(40)) == null, "truncated header")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Codecs.wavFingerprint(badMagic) == null)
  }

  test("Codecs.parseBmp: synth round-trip, stride padding excluded, top-down flag") {
    import graft.ops.Codecs
    for (seed <- Seq(0L, 1L, 3L, 7L, 15L, 100L)) {
      val bytes = Codecs.synthBmp(seed)
      val m = Codecs.parseBmp(bytes).get
      val (w, h) = (1 + (seed % 16).toInt, 1 + (seed % 8).toInt)
      assert(m.width == w && m.height == h && m.bitsPerPixel == 24 && !m.topDown)
      val want = (for (y <- 0 until h; x <- 0 until w; k <- 0 until 3)
        yield (seed + x * 3 + y * 7 + k) % 256).sum
      assert(Codecs.bmpPixelSum(bytes) == want, s"seed=$seed pixel sum")
    }
    // hand-built 1×2 24bpp bottom-up BMP with NONZERO padding bytes:
    // rowSize = 4, so 1 pad byte per row — it must NOT enter the sum
    val out = new java.io.ByteArrayOutputStream()
    def u16w(v: Int) = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32w(v: Long) = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xFF).toInt))
    out.write('B'); out.write('M'); u32w(54 + 8); u32w(0); u32w(54)
    u32w(40); u32w(1); u32w(2); u16w(1); u16w(24); u32w(0); u32w(8)
    u32w(0); u32w(0); u32w(0); u32w(0)
    out.write(10); out.write(20); out.write(30); out.write(0xEE) // file row 0 (display y=1)
    out.write(1); out.write(2); out.write(3); out.write(0xEE)    // file row 1 (display y=0)
    val hand = out.toByteArray
    val hm = graft.ops.Codecs.parseBmp(hand).get
    assert(hm.width == 1 && hm.height == 2 && !hm.topDown)
    assert(Codecs.bmpPixelSum(hand) == 10 + 20 + 30 + 1 + 2 + 3,
      "padding bytes leaked into the pixel sum")
    // top-down variant: biHeight = -2 (same bytes otherwise)
    val td = hand.clone()
    val neg = -2
    for (i <- 0 until 4) td(22 + i) = ((neg >> (8 * i)) & 0xFF).toByte
    val tdm = Codecs.parseBmp(td).get
    assert(tdm.height == 2 && tdm.topDown)
    assert(Codecs.bmpPixelSum(td) == 66, "top-down walk must cover the same pixels")
    // corruption
    val badMagic = hand.clone(); badMagic(0) = 'X'.toByte
    assert(Codecs.parseBmp(badMagic) == None)
    assert(Codecs.parseBmp(hand.take(30)) == None, "truncated header")
    val compressed = hand.clone(); compressed(30) = 1 // biCompression = BI_RLE8
    assert(Codecs.parseBmp(compressed) == None, "compressed BMP must be rejected")
    assert(Codecs.bmpPixelSum(hand.dropRight(3)) == -1L, "truncated pixel array")
    // corrupted pixel-array offset: pointing INSIDE the 54-byte headers
    // (would silently sum header bytes) and u32 values whose toInt goes
    // negative (would AIOOBE) must both return -1, not throw
    val offHdr = hand.clone(); offHdr(10) = 8 // offset = 8 < 54
    assert(Codecs.bmpPixelSum(offHdr) == -1L, "offset into header must fail cleanly")
    val offNeg = hand.clone()
    for (i <- 0 until 4) offNeg(10 + i) = 0xFF.toByte // offset = 0xFFFFFFFF → toInt -1
    assert(Codecs.bmpPixelSum(offNeg) == -1L, "wrapped-negative offset must fail cleanly")
    // biHeight = 0x80000000 (Int.MinValue): math.abs stays NEGATIVE, so
    // every `offset + rowSizeL*height > length` guard would pass on the
    // negative product and the grid walkers would index out of bounds
    // (r13 ADVICE) — parseBmp must reject it outright
    val minH = hand.clone()
    minH(22) = 0; minH(23) = 0; minH(24) = 0; minH(25) = 0x80.toByte
    assert(Codecs.parseBmp(minH) == None, "biHeight=Int.MinValue must be rejected")
    assert(Codecs.bmpPixelSum(minH) == -1L)
    assert(Codecs.bmpDHash(minH) == null)
    assert(Codecs.resizeBmp24(minH, 2) == null)
  }
}
