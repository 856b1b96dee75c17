package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize→shingle kernel, shared by interpreted eval and the
  * generated code (a single static call — no CodegenFallback, no
  * Generate barriers, no repeated regex evaluation).
  *
  * Semantics are pinned to the Column formulation
  * `shingles(tokens(text), n)` (TextFunctions): lowercase,
  * whitespace-collapse+trim, split on single spaces, join n-windows with
  * one space; fewer than n tokens → empty array. Empty text behaves like
  * Spark's `split("", " ")` (one empty token). Bit-equality with the
  * Column formulation is spec-enforced on the test corpus, which is what
  * keeps the DuckDB oracle (string_split + concat_ws) valid.
  */
object ShingleKernel {
  def eval(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(32)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 64-bit shingle hashes in one pass: tokenize → shingle →
    * xxhash64 (Spark's default seed 42, so the result is bit-equal to
    * `array_distinct(transform(graft_shingles(text, n), s → xxhash64(s)))`
    * — spec-enforced) → first-occurrence dedup. Emitting longs instead of
    * shingle strings keeps the hot dedup paths an order of magnitude
    * smaller in memory and shuffle. */
  def evalHashes(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val tb = tokenBytes(toks)
    val buf = shingleBuf(tb, n)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= toks.length - n) {
      seen.add(hashShingle(tb, i, n, buf))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** UTF-8 bytes of each token, computed ONCE per token (each token is
    * otherwise re-encoded into up to `n` shingle strings). */
  private[functions] def tokenBytes(toks: Array[String]): Array[Array[Byte]] = {
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    tb
  }

  /** One reusable buffer sized for the longest window of `n` tokens —
    * the per-shingle StringBuilder→String→UTF8String allocation chain
    * this replaces dominated the kernel's cost, not the hashing. */
  private[functions] def shingleBuf(tb: Array[Array[Byte]], n: Int): Array[Byte] = {
    var maxLen = 0
    var i = 0
    while (i <= tb.length - n) {
      var len = n - 1
      var k = 0
      while (k < n) { len += tb(i + k).length; k += 1 }
      if (len > maxLen) maxLen = len
      i += 1
    }
    new Array[Byte](maxLen)
  }

  /** XXH64 (Spark seed 42) of the shingle `toks[i..i+n)` joined by ' ' —
    * UTF-8 concatenation is byte-wise, so this is bit-equal to hashing
    * `UTF8String.fromString(toks.slice(i, i+n).mkString(" "))`. */
  private[functions] def hashShingle(tb: Array[Array[Byte]], i: Int, n: Int,
      buf: Array[Byte]): Long = {
    var pos = 0
    var k = 0
    while (k < n) {
      if (k > 0) { buf(pos) = ' '; pos += 1 }
      val t = tb(i + k)
      System.arraycopy(t, 0, buf, pos, t.length)
      pos += t.length
      k += 1
    }
    XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
  }
}

/** graft_shingles(text, n): word n-gram shingles straight off the raw
  * text column. Replaces a 2-Generate + interpreted-HOF pipeline with a
  * single per-row kernel call inside whole-stage codegen. */
case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.eval($c, $n)")

  override def prettyName: String = "graft_shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash coefficient tables, derived deterministically from splitmix64
  * (public-domain constant set, Steele et al. 2014) exactly as the
  * aggregate formulation derives them — shared so the kernel and any
  * aggregate twin produce identical signatures. */
object MinhashCoeffs {
  /** 2^31-1 (Mersenne prime): keeps a*h+b < 2^62, inside long range. */
  val P: Long = 2147483647L

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** (a, b) coefficient arrays for `numHashes` permutations:
    * a_i ∈ [1, P-1], b_i ∈ [0, P-1]. */
  def get(numHashes: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(numHashes, { k =>
      val a = new Array[Long](k)
      val b = new Array[Long](k)
      var i = 0
      while (i < k) {
        a(i) = java.lang.Long.remainderUnsigned(splitmix64(2L * i), P - 1) + 1
        b(i) = java.lang.Long.remainderUnsigned(splitmix64(2L * i + 1), P)
        i += 1
      }
      (a, b)
    })
}

/** One-pass winnowing kernel (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * tokenize → positional n-gram shingles → md5 hex per shingle → minimum
  * of every sliding `window` of hashes → first-occurrence distinct.
  * Bit-equal to the Column formulation
  * `array_distinct(transform(sequence(0, greatest(size(hs)-w, 0)),
  *   j => array_min(slice(hs, j+1, w))))` over
  * `hs = transform(graft_shingles(text, n), md5)` — the md5 hex strings
  * are lowercase ASCII, so Java String order equals Spark's UTF8String
  * binary order. Replaces a Generate barrier + O(|doc|·w) interpreted
  * HOF evaluation with one codegen'd call. */
object WinnowKernel {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def eval(text: UTF8String, n: Int, window: Int): ArrayData = {
    if (text == null) return null
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val hs = new Array[String](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(32)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      hs(i) = md5hex(sb.toString)
      i += 1
    }
    // windows start at j = 0 .. max(m - window, 0); a final partial
    // window is truncated at the array end (slice semantics)
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    val lastStart = math.max(m - window, 0)
    while (j <= lastStart) {
      var mn = hs(j)
      var k = j + 1
      val end = math.min(j + window, m)
      while (k < end) {
        if (hs(k).compareTo(mn) < 0) mn = hs(k)
        k += 1
      }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var z = 0
    while (it.hasNext) { out(z) = UTF8String.fromString(it.next()); z += 1 }
    new GenericArrayData(out)
  }
}

/** graft_winnow(text, n, window): winnowing fingerprint set straight off
  * the text column — see [[WinnowKernel]]. */
case class WinnowFingerprints(child: Expression, n: Int, window: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.eval(input.asInstanceOf[UTF8String], n, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKernel.eval($c, $n, $window)")

  override def prettyName: String = "graft_winnow"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_shingle_hashes(text, n): distinct xxhash64 values of the word
  * n-gram shingles, one per-row kernel call inside whole-stage codegen —
  * the compact form of `graft_shingles` for sketch pipelines (MinHash,
  * Jaccard) that only ever consume the hashes. */
case class TokenShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.evalHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.evalHashes($c, $n)")

  override def prettyName: String = "graft_shingle_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass MinHash sketch kernel: tokenize → shingle → xxhash64, and in
  * the same loop maintain (a) the first-occurrence-distinct shingle-hash
  * set and (b) all `numHashes` running minima of (a_i·h + b_i) mod P over
  * h = pmod(xxhash64, P). Duplicate shingles cannot change a minimum, so
  * the signature equals the one computed over the distinct set — and both
  * outputs come from ONE tokenization with no explode, no aggregation,
  * and no shuffle (the former explode + 64-min-aggregate shape
  * materialized ~|shingles| rows per doc and shuffled them by id). */
object SketchKernel {
  def eval(text: UTF8String, n: Int, numHashes: Int): InternalRow = {
    if (text == null) return null
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    val p = MinhashCoeffs.P
    val (ca, cb) = MinhashCoeffs.get(numHashes)
    if (toks.length < n)
      return new GenericInternalRow(Array[Any](
        new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any])))
    val tb = ShingleKernel.tokenBytes(toks)
    val buf = ShingleKernel.shingleBuf(tb, n)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= toks.length - n) {
      val xx = ShingleKernel.hashShingle(tb, i, n, buf)
      seen.add(xx)
      val h = ((xx % p) + p) % p
      var j = 0
      while (j < numHashes) {
        val v = (ca(j) * h + cb(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val shh = new Array[Any](seen.size)
    val it = seen.iterator()
    var z = 0
    while (it.hasNext) { shh(z) = it.next().longValue(); z += 1 }
    val sig = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) { sig(j) = mins(j); j += 1 }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(shh), new GenericArrayData(sig)))
  }
}

/** One-pass SimHash kernel (Manku/Jain/Das Sarma, WWW'07): per token
  * (every occurrence — votes are term-frequency weighted), xxhash64 with
  * Spark's default seed 42, then 64 vote counters (+1 if bit set, −1
  * otherwise); output bit i is set iff votes(i) > 0. Bit-equal to the
  * explode + 64-sum-aggregate formulation (spec-enforced) without
  * materializing one row per token. */
object SimhashKernel {
  def eval(text: UTF8String): Long = {
    if (text == null) return 0L
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val u = UTF8String.fromString(toks(i))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var j = 0
      while (j < 64) {
        if ((h & (1L << j)) != 0) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** graft_simhash(text): 64-bit SimHash signature of the token stream —
  * see [[SimhashKernel]]. */
case class SimhashSignature(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SimhashKernel.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashKernel.eval($c)")

  override def prettyName: String = "graft_simhash"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_shingle_sketch(text, n, numHashes):
  * struct(shh: array<long>, sig: array<long>) — the staged-table row for
  * MinHash dedup, produced in one narrow kernel call (see
  * [[SketchKernel]]). */
case class ShingleSketch(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("shh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SketchKernel.eval(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernel.eval($c, $n, $numHashes)")

  override def prettyName: String = "graft_shingle_sketch"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
