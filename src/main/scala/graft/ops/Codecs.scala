package graft.ops

/** Real, dependency-free binary codecs for the two formats whose
  * uncompressed layouts are fully parseable with plain byte arithmetic:
  * RIFF/WAVE (PCM) and BMP (BITMAPINFOHEADER, 24bpp). These replace the
  * [[Multimodal]] hash-stub for the wav/bmp paths — the parsers handle
  * arbitrary little-endian chunk layouts (unknown-chunk skipping, row
  * padding, bottom-up rows), not just the bytes our encoders emit, and
  * MultimodalSpec pins them on hand-built and corrupted byte vectors.
  *
  * The matching ENCODERS exist because the synthetic corpus has no real
  * media: they derive every parameter and sample deterministically from a
  * seed, so a DuckDB oracle can replay decode(encode(seed)) end to end in
  * SQL — the decode path is graded on real byte-format logic AND stays
  * hash-comparable.
  *
  * All functions are driver/executor-pure JVM code (no I/O, no native
  * libs); the Spark surface wrapping them in [[Multimodal]] stays the
  * same narrow per-row UDF pass.
  */
object Codecs {

  // ---- little-endian readers (bounds-checked: None on truncation) ----
  private def u16(b: Array[Byte], off: Int): Option[Int] =
    if (off + 2 > b.length) None
    else Some((b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8))
  private def u32(b: Array[Byte], off: Int): Option[Long] =
    if (off + 4 > b.length) None
    else Some(((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24))
  private def i32(b: Array[Byte], off: Int): Option[Int] =
    u32(b, off).map(_.toInt)
  private def tag(b: Array[Byte], off: Int): Option[String] =
    if (off + 4 > b.length) None
    else Some(new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII))

  // ---- little-endian writers ----
  private def putU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def putU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }
  private def putTag(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  // ================================ WAV ================================

  /** Parsed "fmt " + "data" facts of a PCM RIFF/WAVE file.
    * nFrames = dataSize / blockAlign (samples per channel). */
  final case class WavMeta(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nFrames: Int)

  /** Parse a RIFF/WAVE header: verify magic, then walk the chunk list
    * (each chunk is tag + u32 size + payload, word-aligned) skipping
    * unknown chunks until both "fmt " and "data" are seen — the layout
    * rule real files exercise with LIST/INFO/fact chunks between fmt
    * and data. Returns None on any structural violation (bad magic,
    * truncated chunk, non-PCM format code, zero blockAlign). */
  def parseWav(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 12) return None
    if (!tag(bytes, 0).contains("RIFF") || !tag(bytes, 8).contains("WAVE")) return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (ch, sr, bits, blockAlign)
    var dataSize = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataSize < 0)) {
      val t = tag(bytes, off).get
      val sz = u32(bytes, off + 4).get
      val body = off + 8
      if (body + sz > bytes.length) return None // truncated chunk
      t match {
        case "fmt " =>
          if (sz < 16) return None
          val audioFormat = u16(bytes, body).get
          if (audioFormat != 1) return None // PCM only
          val ch = u16(bytes, body + 2).get
          val sr = u32(bytes, body + 4).get.toInt
          val blockAlign = u16(bytes, body + 12).get
          val bits = u16(bytes, body + 14).get
          if (ch <= 0 || blockAlign <= 0) return None
          fmt = Some((ch, sr, bits, blockAlign))
        case "data" => dataSize = sz
        case _ => () // LIST/fact/bext/…: skip
      }
      off = body + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    fmt.flatMap { case (ch, sr, bits, blockAlign) =>
      if (dataSize < 0) None
      else Some(WavMeta(ch, sr, bits, (dataSize / blockAlign).toInt))
    }
  }

  /** Decode the 16-bit LE PCM samples of the "data" chunk, interleaved
    * (frame-major, channel-minor). Empty for non-16-bit or invalid. */
  def decodeWavPcm16(bytes: Array[Byte]): Array[Int] = {
    val meta = parseWav(bytes).orNull
    if (meta == null || meta.bitsPerSample != 16) return Array.empty
    // second walk to locate the data chunk body
    var off = 12
    while (off + 8 <= bytes.length) {
      val t = tag(bytes, off).get
      val sz = u32(bytes, off + 4).get.toInt
      if (t == "data") {
        val n = sz / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val lo = bytes(off + 8 + 2 * i) & 0xFF
          val hi = bytes(off + 8 + 2 * i + 1)
          out(i) = (hi << 8) | lo // sign-extends via hi
          i += 1
        }
        return out
      }
      off += 8 + sz + (sz & 1)
    }
    Array.empty
  }

  /** Deterministic 16-bit PCM WAV from a seed — parameters and samples
    * are pure integer formulas of (seed, frame, channel) so a SQL oracle
    * can replay the decoded output exactly:
    *   channels   = 1 + seed % 2
    *   sampleRate = 8000 + (seed % 3) * 4000
    *   nFrames    = 16 + seed % 50
    *   s(i, c)    = (((seed·31 + i·7 + c·13) mod 256) − 128) · 64
    * Every 5th seed inserts a LIST chunk between fmt and data, so the
    * corpus itself exercises the parser's unknown-chunk skipping. */
  def synthWav(seed: Long): Array[Byte] = {
    val s = math.floorMod(seed, 1000000L)
    val ch = (1 + s % 2).toInt
    val sr = (8000 + (s % 3) * 4000).toInt
    val nf = (16 + s % 50).toInt
    val dataSize = nf * ch * 2
    val listBody = if (s % 5 == 0) "INFO".getBytes("US-ASCII") else Array.empty[Byte]
    val listSize = if (listBody.nonEmpty) 8 + listBody.length else 0
    val out = new java.io.ByteArrayOutputStream(44 + listSize + dataSize)
    putTag(out, "RIFF"); putU32(out, 4 + 24 + listSize + 8 + dataSize)
    putTag(out, "WAVE")
    putTag(out, "fmt "); putU32(out, 16)
    putU16(out, 1); putU16(out, ch); putU32(out, sr)
    putU32(out, sr.toLong * ch * 2); putU16(out, ch * 2); putU16(out, 16)
    if (listBody.nonEmpty) {
      putTag(out, "LIST"); putU32(out, listBody.length); out.write(listBody)
    }
    putTag(out, "data"); putU32(out, dataSize)
    var i = 0
    while (i < nf) {
      var c = 0
      while (c < ch) {
        val v = (((s * 31 + i * 7 + c * 13) % 256) - 128).toInt * 64
        putU16(out, v & 0xFFFF)
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Energy-comparison audio fingerprint — the dHash idea on PCM
    * (Haitsma–Kalker-style sign-of-energy-difference, collapsed to one
    * band): decode the 16-bit samples via the real chunk-walking parser,
    * split them into 65 equal windows (boundary ⌊w·n/65⌋), take the
    * exact integer energy e(w) = Σ x², and set bit w of the 64-bit hash
    * iff e(w+1) > e(w). Integer end to end, so near-duplicate detection
    * over it ([[graft.ops.Dedup.hammingNearDup]]) is exactly replayable;
    * a perturbation that preserves the energy ORDER of neighboring
    * windows flips no bit, a 1-sample edit flips at most the one
    * comparison its window participates in. Returns null on parse
    * failure / non-16-bit / fewer than 65 samples (empty windows would
    * make trailing bits degenerate). */
  def wavFingerprint(bytes: Array[Byte]): java.lang.Long = {
    val pcm = decodeWavPcm16(bytes)
    if (pcm.length < 65) return null
    val n = pcm.length
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      // Long boundary math: w*n overflows Int for PCM beyond ~33.5M
      // samples (a ~35-min 16 kHz mono file is a VALID input)
      var i = (w.toLong * n / 65).toInt
      val end = ((w + 1).toLong * n / 65).toInt
      var acc = 0L
      while (i < end) { acc += pcm(i).toLong * pcm(i); i += 1 }
      e(w) = acc
      w += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) { if (e(b + 1) > e(b)) hash |= 1L << b; b += 1 }
    hash
  }

  /** Deterministic mono 16-bit WAV with a plantable near-duplicate
    * perturbation — [[synthWav]]'s sibling for the audio-fingerprint
    * dedup pipeline (q_audio_fp), sized so the 65-window fingerprint is
    * non-degenerate (2080 frames = 65 windows × 32 samples exactly).
    * Samples come from the same middle-square mix the image synth uses
    * (linear mixes collapse the fingerprint space — see
    * [[synthBmpNear]]'s measured note):
    *   i = s + 1000003·j;  sample j = (i² >> 20) mod 4096 − 2048
    * (i < 2.1e9 so i² < 2⁶³ — a DuckDB twin replays it without
    * overflow). `pert` is added to sample 0 inside the wrap
    * ((v + 2048 + pert) mod 4096 − 2048) — a 1-sample edit that only
    * window 0's energy sees, flipping at most dHash bit 0. */
  def synthWavNear(seed: Long, pert: Int): Array[Byte] = {
    val s = math.floorMod(seed, 1000000L)
    val nf = 2080
    val dataSize = nf * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    putTag(out, "RIFF"); putU32(out, 4 + 24 + 8 + dataSize)
    putTag(out, "WAVE")
    putTag(out, "fmt "); putU32(out, 16)
    putU16(out, 1); putU16(out, 1); putU32(out, 16000L)
    putU32(out, 16000L * 2); putU16(out, 2); putU16(out, 16)
    putTag(out, "data"); putU32(out, dataSize)
    var j = 0
    while (j < nf) {
      val i = s + 1000003L * j
      var v = (((i * i) >> 20) % 4096 - 2048).toInt
      if (j == 0) v = ((v + 2048 + pert) % 4096) - 2048
      putU16(out, v & 0xFFFF)
      j += 1
    }
    out.toByteArray
  }

  // ================================ BMP ================================

  /** Parsed facts of a BMP file (BITMAPINFOHEADER, uncompressed).
    * `topDown` reflects a negative biHeight. */
  final case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int,
      topDown: Boolean)

  /** Parse a BMP header: "BM" magic, pixel-array offset, DIB header
    * (≥40-byte BITMAPINFOHEADER), uncompressed (biCompression = 0).
    * None on bad magic / truncation / compressed data. */
  def parseBmp(bytes: Array[Byte]): Option[BmpMeta] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    for {
      dibSize <- u32(bytes, 14) if dibSize >= 40
      w <- i32(bytes, 18) if w > 0
      // hRaw == Int.MinValue would survive math.abs (still negative) and
      // make every `offset + rowSizeL*height > length` guard pass on the
      // negative product — reject it like parseAvi rejects w/h <= 0
      hRaw <- i32(bytes, 22) if hRaw != 0 && hRaw != Int.MinValue
      bpp <- u16(bytes, 28)
      comp <- u32(bytes, 30) if comp == 0
    } yield BmpMeta(w, math.abs(hRaw), bpp, topDown = hRaw < 0)
  }

  // Long: a crafted header width near Int.MaxValue must not overflow the
  // stride (the negative-stride bounds guards below would pass); after a
  // Long bounds check against bytes.length the stride always fits Int
  private def bmpRowSize(w: Int): Long = (3L * w + 3) / 4 * 4

  /** Sum of all pixel bytes (B+G+R over every pixel) of a 24bpp BMP —
    * exercises the genuine layout rules: pixel-array offset from the
    * file header, 4-byte row padding excluded, bottom-up (or top-down)
    * row order walked explicitly. Returns -1 on parse failure or
    * non-24bpp. (A sum is row-order-independent, but the walk indexes
    * rows in display order through the offset/stride math, so a stride
    * or offset bug shows up immediately.) */
  def bmpPixelSum(bytes: Array[Byte]): Long = {
    val meta = parseBmp(bytes).orNull
    if (meta == null || meta.bitsPerPixel != 24) return -1L
    val offset = u32(bytes, 10).get.toInt
    val rowSizeL = bmpRowSize(meta.width)
    // lower bound too: a corrupted offset that is negative (u32 wrapped
    // by toInt) or points inside the 54-byte headers would pass the
    // upper-bound check and either AIOOBE or silently sum header bytes —
    // both break the documented "-1 on parse failure" contract
    if (offset < 54 || offset >= bytes.length) return -1L
    if (offset + rowSizeL * meta.height > bytes.length) return -1L
    val rowSize = rowSizeL.toInt
    var sum = 0L
    var y = 0
    while (y < meta.height) {
      // display row y sits at file row (height-1-y) when bottom-up
      val fileRow = if (meta.topDown) y else meta.height - 1 - y
      val rowOff = offset + fileRow * rowSize
      var x = 0
      while (x < 3 * meta.width) {
        sum += bytes(rowOff + x) & 0xFF
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Difference hash (dHash) of a 24bpp BMP — the standard perceptual
    * image fingerprint: sample a 9×8 grayscale grid (nearest-neighbor,
    * px = ⌊gx·w/9⌋, py = ⌊gy·h/8⌋), then bit (gy·8 + gx) of the 64-bit
    * hash is 1 iff gray(gx+1, gy) > gray(gx, gy). All-integer end to
    * end (gray = 299·R + 587·G + 114·B, the ITU-601 luma weights scaled
    * by 1000), so near-duplicate detection over it is exactly
    * replayable: a 1-pixel perturbation flips at most the comparisons
    * that sample that pixel. Walks the real file layout — pixel-array
    * offset, 4-byte row stride, bottom-up (or top-down) row order —
    * like [[bmpPixelSum]]. Returns null on parse failure / non-24bpp /
    * truncation, so a corrupt payload drops out of the banded join
    * instead of clustering with other corrupt payloads. */
  def bmpDHash(bytes: Array[Byte]): java.lang.Long = {
    val meta = parseBmp(bytes).orNull
    if (meta == null || meta.bitsPerPixel != 24) return null
    val offset = u32(bytes, 10).get.toInt
    val rowSizeL = bmpRowSize(meta.width)
    if (offset < 54 || offset >= bytes.length) return null
    if (offset + rowSizeL * meta.height > bytes.length) return null
    dHashOfPixels(bytes, offset, meta.width, meta.height, rowSizeL.toInt,
      meta.topDown)
  }

  /** The shared 9×8 integer-grayscale sample grid over a raw BGR24
    * pixel block (gy-major, 72 values) — the common core of the dHash
    * and the image FEATURE vector; caller has bounds-checked
    * `offset + rowSize·height ≤ length`. */
  private def grayGrid(bytes: Array[Byte], offset: Int, width: Int,
      height: Int, rowSize: Int, topDown: Boolean): Array[Long] = {
    val gray = new Array[Long](72)
    var gy = 0
    while (gy < 8) {
      val py = (gy.toLong * height / 8).toInt
      val fileRow = if (topDown) py else height - 1 - py
      val rowOff = offset + fileRow * rowSize
      var gx = 0
      while (gx < 9) {
        val px = (gx.toLong * width / 9).toInt
        val p = rowOff + 3 * px
        gray(gy * 9 + gx) = 114L * (bytes(p) & 0xFF) +
          587L * (bytes(p + 1) & 0xFF) + 299L * (bytes(p + 2) & 0xFF)
        gx += 1
      }
      gy += 1
    }
    gray
  }

  /** The dHash core over a raw BGR24 pixel block at `offset` — shared by
    * [[bmpDHash]] and the AVI keyframe hash ([[aviKeyframeDHash]]). */
  private def dHashOfPixels(bytes: Array[Byte], offset: Int, width: Int,
      height: Int, rowSize: Int, topDown: Boolean): Long = {
    val gray = grayGrid(bytes, offset, width, height, rowSize, topDown)
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gray(gy * 9 + gx + 1) > gray(gy * 9 + gx)) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** REAL image feature extraction: the 9×8 integer-grayscale sample
    * grid as a 72-dim vector (gy-major; values are exact integers ≤
    * 255,000, exactly representable as doubles, so similarity math over
    * them is bit-replayable in SQL). Feeds [[graft.ops.Similarity]]'s
    * vector ops unchanged — decode → feature-extract → kNN/ANN is the
    * multimodal retrieval chain. null on parse failure / non-24bpp. */
  def bmpGrayFeatures(bytes: Array[Byte]): Array[Double] = {
    val meta = parseBmp(bytes).orNull
    if (meta == null || meta.bitsPerPixel != 24) return null
    val offset = u32(bytes, 10).get.toInt
    val rowSizeL = bmpRowSize(meta.width)
    if (offset < 54 || offset >= bytes.length) return null
    if (offset + rowSizeL * meta.height > bytes.length) return null
    grayGrid(bytes, offset, meta.width, meta.height, rowSizeL.toInt,
        meta.topDown)
      .map(_.toDouble)
  }

  /** Deterministic 18×16 24bpp bottom-up BMP with a plantable
    * near-duplicate perturbation — [[synthBmp]]'s sibling for the
    * perceptual-hash dedup pipeline (q_image_phash). Pixel bytes come
    * from middle-square mixing of a compact pixel index:
    *   i = s + 1000003·(x + 18y + 288k);  byte = (i² >> 20) mod 256
    * (i < 2³⁰ so i² < 2⁶⁰ — a DuckDB twin replays it without overflow).
    * The nonlinearity is load-bearing: any LINEAR mix (additive or
    * Knuth-multiplicative) shifts every pixel of an image by the same
    * constant as the seed increments, which preserves all grayscale
    * comparisons — every seed then collapses to a handful of dHash
    * values and the banded join degenerates toward a cross product
    * (measured: 50 distinct hashes over 200 seeds multiplicative vs
    * 200/200 middle-square, accidental hamming ≤ 3 pairs 13k vs 0).
    * `pert` is added to the blue byte of pixel (0, 0) (mod 256) — the
    * 1-pixel near-duplicate edit, which flips at most ONE dHash bit
    * (pixel (0,0) is sampled only by grid cell (0,0), and only the
    * gx 0↔1 comparison reads it). */
  def synthBmpNear(seed: Long, pert: Int): Array[Byte] = {
    val s = math.floorMod(seed, 1000000L)
    val w = 18; val h = 16
    val rowSize = ((3 * w + 3) / 4) * 4
    val pixelArray = rowSize * h
    val out = new java.io.ByteArrayOutputStream(54 + pixelArray)
    putTag(out, "BM")
    putU32(out, 54L + pixelArray); putU32(out, 0L); putU32(out, 54L)
    putU32(out, 40L); putU32(out, w.toLong); putU32(out, h.toLong)
    putU16(out, 1); putU16(out, 24); putU32(out, 0L); putU32(out, pixelArray.toLong)
    putU32(out, 2835L); putU32(out, 2835L); putU32(out, 0L); putU32(out, 0L)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up
      var x = 0
      while (x < w) {
        var k = 0
        while (k < 3) {
          val i = s + 1000003L * (x + 18 * y + 288 * k)
          var v = ((i * i) >> 20) % 256
          if (x == 0 && y == 0 && k == 0) v = (v + pert) % 256
          out.write(v.toInt)
          k += 1
        }
        x += 1
      }
      var pad = 3 * w
      while (pad < rowSize) { out.write(0); pad += 1 }
      fileRow += 1
    }
    out.toByteArray
  }

  /** Integer box-filter downsample of a 24bpp BMP — the REAL resize
    * step of the multimodal pipeline (thumbnail generation): output
    * pixel (x, y) channel k = ⌊mean of the f×f input block⌋ (exact
    * integer floor, so a SQL oracle replays it bit-for-bit), trailing
    * rows/columns that do not fill a block are cropped (standard box
    * behavior). The result is RE-ENCODED as a valid bottom-up 24bpp BMP
    * — resize(decode(x)) feeds straight back into [[parseBmp]] /
    * [[bmpDHash]] / [[bmpPixelSum]]. null on parse failure, non-24bpp,
    * truncation, or an output dimension of zero. */
  def resizeBmp24(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val meta = parseBmp(bytes).orNull
    if (meta == null || meta.bitsPerPixel != 24) return null
    val offset = u32(bytes, 10).get.toInt
    val rowSizeL = bmpRowSize(meta.width)
    if (offset < 54 || offset >= bytes.length) return null
    if (offset + rowSizeL * meta.height > bytes.length) return null
    val rowSize = rowSizeL.toInt
    val ow = meta.width / factor
    val oh = meta.height / factor
    if (ow == 0 || oh == 0) return null
    val oRowSize = ((3 * ow + 3) / 4) * 4
    val out = new java.io.ByteArrayOutputStream(54 + oRowSize * oh)
    putTag(out, "BM")
    putU32(out, 54L + oRowSize * oh); putU32(out, 0L); putU32(out, 54L)
    putU32(out, 40L); putU32(out, ow.toLong); putU32(out, oh.toLong)
    putU16(out, 1); putU16(out, 24); putU32(out, 0L)
    putU32(out, (oRowSize * oh).toLong)
    putU32(out, 2835L); putU32(out, 2835L); putU32(out, 0L); putU32(out, 0L)
    // display-order pixel accessor over the input's real layout
    def px(x: Int, y: Int, k: Int): Int = {
      val fileRow = if (meta.topDown) y else meta.height - 1 - y
      bytes(offset + fileRow * rowSize + 3 * x + k) & 0xFF
    }
    var fileRow = 0
    while (fileRow < oh) {
      val oy = oh - 1 - fileRow // bottom-up output
      var ox = 0
      while (ox < ow) {
        var k = 0
        while (k < 3) {
          var acc = 0L
          var dy = 0
          while (dy < factor) {
            var dx = 0
            while (dx < factor) {
              acc += px(ox * factor + dx, oy * factor + dy, k)
              dx += 1
            }
            dy += 1
          }
          out.write((acc / (factor.toLong * factor)).toInt)
          k += 1
        }
        ox += 1
      }
      var pad = 3 * ow
      while (pad < oRowSize) { out.write(0); pad += 1 }
      fileRow += 1
    }
    out.toByteArray
  }

  // ================================ AVI ================================

  /** Parsed facts of an uncompressed AVI: main-header fields plus the
    * byte offset of each '00db' (uncompressed DIB) frame's pixel block. */
  final case class AviMeta(width: Int, height: Int, nFrames: Int,
      usPerFrame: Long, frameOffsets: Vector[Int])

  /** Parse a RIFF/AVI container: verify the RIFF/'AVI ' magic, walk the
    * top-level chunk list, read the 'avih' main header inside LIST
    * 'hdrl' (µs/frame, total frames, width, height), and collect the
    * offset of every '00db' uncompressed-frame chunk inside LIST 'movi'
    * — the same word-aligned tag+size walk as [[parseWav]], one level
    * deeper. None on bad magic, truncation, a missing header, or a
    * frame-count/chunk-count mismatch. */
  def parseAvi(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes == null || bytes.length < 12) return None
    if (!tag(bytes, 0).contains("RIFF") || !tag(bytes, 8).contains("AVI ")) return None
    var off = 12
    var hdr: Option[(Int, Int, Int, Long)] = None // (w, h, nFrames, usPerFrame)
    val frames = Vector.newBuilder[Int]
    var nDb = 0
    while (off + 8 <= bytes.length) {
      val t = tag(bytes, off).getOrElse(return None)
      val sz = u32(bytes, off + 4).getOrElse(return None)
      val body = off + 8
      if (body + sz > bytes.length) return None // truncated chunk
      if (t == "LIST" && sz >= 4) {
        tag(bytes, body) match {
          case Some("hdrl") =>
            // sub-chunks after the 4-byte list type; we need 'avih'
            var so = body + 4
            while (so + 8 <= body + sz) {
              val st = tag(bytes, so).getOrElse(return None)
              // size stays Long until bounds-checked: a crafted u32 like
              // 0xFFFFFFF8 truncated to Int would pass the guard and
              // either spin the walk forever or wrap `so` negative
              val sszL = u32(bytes, so + 4).getOrElse(return None)
              if (so + 8 + sszL > bytes.length) return None
              val ssz = sszL.toInt
              if (st == "avih") {
                if (ssz < 40) return None
                val us = u32(bytes, so + 8).get
                val nf = u32(bytes, so + 8 + 16).get.toInt
                val w = u32(bytes, so + 8 + 32).get.toInt
                val h = u32(bytes, so + 8 + 36).get.toInt
                if (w <= 0 || h <= 0 || nf < 0) return None
                hdr = Some((w, h, nf, us))
              }
              so += 8 + ssz + (ssz & 1)
            }
          case Some("movi") =>
            var so = body + 4
            while (so + 8 <= body + sz) {
              val st = tag(bytes, so).getOrElse(return None)
              val sszL = u32(bytes, so + 4).getOrElse(return None)
              if (so + 8 + sszL > bytes.length) return None
              val ssz = sszL.toInt
              if (st == "00db") { frames += (so + 8); nDb += 1 }
              so += 8 + ssz + (ssz & 1)
            }
          case _ => ()
        }
      }
      off = body + sz.toInt + (sz.toInt & 1)
    }
    hdr.flatMap { case (w, h, nf, us) =>
      if (nDb != nf) None // header/payload mismatch = corrupt
      else Some(AviMeta(w, h, nf, us, frames.result()))
    }
  }

  // Long: a crafted header width near Int.MaxValue must not overflow the
  // stride (a negative stride passes the frame bounds guard and indexes
  // out of range); after the Long bounds check a stride always fits Int
  private def aviRowSize(w: Int): Long = (3L * w + 3) / 4 * 4

  /** Sum of all pixel bytes over EVERY frame (padding excluded) — the
    * video sibling of [[bmpPixelSum]]: exercises the container walk,
    * per-frame offsets, and the BMP-style bottom-up padded-stride frame
    * layout. -1 on parse failure or a frame overrunning the buffer. */
  def aviPixelSum(bytes: Array[Byte]): Long = {
    val meta = parseAvi(bytes).orNull
    if (meta == null) return -1L
    aviPixelSum(bytes, meta)
  }

  /** [[aviPixelSum]] over an ALREADY-PARSED container — callers that
    * also need the header ([[Multimodal.decodeAviMeta]]) walk the
    * two-level chunk list once, not twice. */
  def aviPixelSum(bytes: Array[Byte], meta: AviMeta): Long = {
    val rowSizeL = aviRowSize(meta.width)
    var sum = 0L
    for (fo <- meta.frameOffsets) {
      if (fo + rowSizeL * meta.height > bytes.length) return -1L
      // the Long bounds check passed, so the stride and 3·width fit Int
      val rowSize = rowSizeL.toInt
      var y = 0
      while (y < meta.height) {
        val rowOff = fo + y * rowSize
        var x = 0
        while (x < 3 * meta.width) { sum += bytes(rowOff + x) & 0xFF; x += 1 }
        y += 1
      }
    }
    sum
  }

  /** Perceptual keyframe fingerprint of an AVI: [[dHashOfPixels]] (the
    * same 9×8 integer-grayscale grid as [[bmpDHash]]) over frame 0 —
    * the thumbnail/keyframe near-dup technique. null on parse failure,
    * zero frames, or a truncated frame. */
  def aviKeyframeDHash(bytes: Array[Byte]): java.lang.Long = {
    val meta = parseAvi(bytes).orNull
    if (meta == null || meta.nFrames == 0) return null
    val rowSizeL = aviRowSize(meta.width)
    val fo = meta.frameOffsets.head
    if (fo + rowSizeL * meta.height > bytes.length) return null
    dHashOfPixels(bytes, fo, meta.width, meta.height, rowSizeL.toInt,
      topDown = false)
  }

  /** Per-frame dHashes of an uncompressed AVI — the multi-frame
    * generalization of [[aviKeyframeDHash]] (r15): one 64-bit dHash per
    * '00db' frame, in movi-list order (index = frame_idx), over the
    * SAME 9×8 integer-grayscale grid. Real thumbnail-reuse detection
    * bands over ALL frames, not just frame 0 — a still reused at any
    * offset in the video is caught. null on parse failure or any frame
    * overrunning the buffer (a corrupt container yields no partial
    * signature set). */
  def aviFrameDHashes(bytes: Array[Byte]): Array[Long] = {
    val meta = parseAvi(bytes).orNull
    if (meta == null) return null
    val rowSizeL = aviRowSize(meta.width)
    val out = new Array[Long](meta.frameOffsets.length)
    var i = 0
    while (i < out.length) {
      val fo = meta.frameOffsets(i)
      if (fo + rowSizeL * meta.height > bytes.length) return null
      out(i) = dHashOfPixels(bytes, fo, meta.width, meta.height,
        rowSizeL.toInt, topDown = false)
      i += 1
    }
    out
  }

  /** Deterministic 18×16 uncompressed AVI (RIFF 'AVI ' / LIST hdrl /
    * avih / LIST movi / '00db' raw bottom-up BGR frames) with a
    * plantable near-duplicate perturbation — the video sibling of
    * [[synthBmpNear]]/[[synthWavNear]]:
    *   nFrames    = 4 + seed mod 5,  µs/frame = 33333·(1 + seed mod 3)
    *   byte k of pixel (x, y) of frame f =
    *     ((i²) >> 20) mod 256,  i = s + 1000003·(x + 18y + 288k) + 7777777·f
    * (i < 1e9 so i² < 2⁶³ — DuckDB-replayable), plus `pert` on the blue
    * byte of pixel (0, 0) of frame 0 (mod 256) — a 1-pixel 1-frame edit
    * that flips at most ONE keyframe-dHash bit. */
  def synthAviNear(seed: Long, pert: Int): Array[Byte] = {
    val s = math.floorMod(seed, 1000000L)
    val nf = (4 + s % 5).toInt
    writeAvi(nf, 33333L * (1 + s % 3), (f, x, y, k) => {
      val i = s + 1000003L * (x + 18 * y + 288 * k) + 7777777L * f
      var v = ((i * i) >> 20) % 256
      if (x == 0 && y == 0 && k == 0 && f == 0) v = (v + pert) % 256
      v.toInt
    })
  }

  /** [[synthAviNear]]'s sibling with the BMP-matching plane at an
    * ARBITRARY frame — the multi-frame reuse fixture (r15): frame
    * `reuseFrame mod nf` carries exactly [[synthBmpNear]](seed, pert)'s
    * pixels (its frame term drops, and the 1-pixel perturbation moves
    * to it); every other frame f uses the 7777777·(f+1) term, so NO
    * other frame — frame 0 included — matches any image plane. Same
    * container layout, dimensions, nFrames and µs/frame as
    * [[synthAviNear]]. */
  def synthAviNearAt(seed: Long, pert: Int, reuseFrame: Int): Array[Byte] = {
    val s = math.floorMod(seed, 1000000L)
    val nf = (4 + s % 5).toInt
    val rf = math.floorMod(reuseFrame.toLong, nf.toLong).toInt
    writeAvi(nf, 33333L * (1 + s % 3), (f, x, y, k) => {
      val ft = if (f == rf) 0L else 7777777L * (f + 1)
      val i = s + 1000003L * (x + 18 * y + 288 * k) + ft
      var v = ((i * i) >> 20) % 256
      if (x == 0 && y == 0 && k == 0 && f == rf) v = (v + pert) % 256
      v.toInt
    })
  }

  /** The shared 18×16 RIFF/AVI writer behind [[synthAviNear]] and
    * [[synthAviNearAt]]: container layout is fixed, `pixel(f, x, y, k)`
    * supplies each byte (y in display order; rows are written
    * bottom-up, padded to the 4-byte stride). */
  private def writeAvi(nf: Int, us: Long,
      pixel: (Int, Int, Int, Int) => Int): Array[Byte] = {
    val w = 18; val h = 16
    val rowSize = aviRowSize(w).toInt // w = 18, no overflow possible
    val frameBytes = rowSize * h
    val moviSize = 4 + nf * (8 + frameBytes)
    val hdrlSize = 4 + 8 + 56
    val out = new java.io.ByteArrayOutputStream(12 + 8 + hdrlSize + 8 + moviSize)
    putTag(out, "RIFF")
    putU32(out, 4L + 8 + hdrlSize + 8 + moviSize)
    putTag(out, "AVI ")
    putTag(out, "LIST"); putU32(out, hdrlSize.toLong); putTag(out, "hdrl")
    putTag(out, "avih"); putU32(out, 56L)
    putU32(out, us)                    // dwMicroSecPerFrame
    putU32(out, 0L); putU32(out, 0L); putU32(out, 0L) // maxBytesPerSec/padding/flags
    putU32(out, nf.toLong)             // dwTotalFrames
    putU32(out, 0L); putU32(out, 1L)   // initialFrames / streams
    putU32(out, frameBytes.toLong)     // suggestedBufferSize
    putU32(out, w.toLong); putU32(out, h.toLong)
    putU32(out, 0L); putU32(out, 0L); putU32(out, 0L); putU32(out, 0L) // reserved
    putTag(out, "LIST"); putU32(out, moviSize.toLong); putTag(out, "movi")
    var f = 0
    while (f < nf) {
      putTag(out, "00db"); putU32(out, frameBytes.toLong)
      var fileRow = 0
      while (fileRow < h) {
        val y = h - 1 - fileRow // bottom-up, like the BMP frames
        var x = 0
        while (x < w) {
          var k = 0
          while (k < 3) {
            out.write(pixel(f, x, y, k))
            k += 1
          }
          x += 1
        }
        var pad = 3 * w
        while (pad < rowSize) { out.write(0); pad += 1 }
        fileRow += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Deterministic 24bpp bottom-up BMP from a seed:
    *   width  = 1 + seed % 16, height = 1 + seed % 8
    *   byte k of pixel (x, y) = (seed + x·3 + y·7 + k) mod 256
    * (x right, y DOWN in display order — the encoder writes rows
    * bottom-up as the format requires, so decoding must un-reverse). */
  def synthBmp(seed: Long): Array[Byte] = {
    val s = math.floorMod(seed, 1000000L)
    val w = (1 + s % 16).toInt
    val h = (1 + s % 8).toInt
    val rowSize = ((3 * w + 3) / 4) * 4
    val pixelArray = rowSize * h
    val out = new java.io.ByteArrayOutputStream(54 + pixelArray)
    putTag(out, "BM")
    putU32(out, 54L + pixelArray); putU32(out, 0L); putU32(out, 54L)
    putU32(out, 40L); putU32(out, w.toLong); putU32(out, h.toLong)
    putU16(out, 1); putU16(out, 24); putU32(out, 0L); putU32(out, pixelArray.toLong)
    putU32(out, 2835L); putU32(out, 2835L); putU32(out, 0L); putU32(out, 0L)
    var fileRow = 0
    while (fileRow < h) {
      val y = h - 1 - fileRow // bottom-up: first file row is the last display row
      var x = 0
      while (x < w) {
        var k = 0
        while (k < 3) { out.write(((s + x * 3 + y * 7 + k) % 256).toInt); k += 1 }
        x += 1
      }
      var pad = 3 * w
      while (pad < rowSize) { out.write(0); pad += 1 }
      fileRow += 1
    }
    out.toByteArray
  }
}
