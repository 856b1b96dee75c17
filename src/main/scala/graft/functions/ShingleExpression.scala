package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(32)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val u = UTF8String.fromString(sb.toString)
      seen.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
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
