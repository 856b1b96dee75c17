package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass content-defined-chunking boundary kernel: the 1-based
  * character positions `i` where `xxhash64(substr(text, i, w)) % modulus
  * == 0` (positive mod), i.e. exactly the positions
  * [[graft.ops.Dedup.cdcChunks]]'s original HOF form
  * `filter(sequence(1, n-w+1), i => pmod(xxhash64(substr(text,i,w)), m)=0)`
  * selected.
  *
  * Why a native expression: the HOF form is the lambda-scope trap this
  * codebase already documented for term counts — `substr(text, i, w)`
  * inside a `filter` lambda builds per-position Column machinery and the
  * whole filter is CodegenFallback, O(len·w) with interpreter overhead
  * per window. This kernel walks the document once: UTF-8 character
  * offsets in one scan, then one XXH64 call per window over the raw
  * bytes — no substring is ever materialized.
  *
  * Bit-fidelity with the HOF form (DedupSpec pins it):
  *   - `substr` is CHARACTER-based; the kernel windows over UTF-8
  *     character offsets, so multi-byte text hashes the same bytes the
  *     materialized substring would;
  *   - the hash is Spark's own XXH64 with the engine seed 42 over the
  *     window's UTF-8 bytes — the identical computation
  *     `xxhash64(substr(...))` performs;
  *   - `pmod(h, m) == 0` ⇔ `((h % m) + m) % m == 0` for the signed
  *     64-bit hash;
  *   - `numChars < w` yields an empty array (the HOF form's `when` arm).
  */
object CdcBoundariesKernel {
  def eval(text: UTF8String, w: Int, modulus: Int): ArrayData = {
    val b = text.getBytes
    val nb = b.length
    // character start offsets (one pass); charOff(i) = byte offset of the
    // i-th character, charOff(numChars) = nb
    var numChars = 0
    var off = 0
    while (off < nb) { numChars += 1; off += UTF8String.numBytesForFirstByte(b(off)) }
    if (numChars < w) return new GenericArrayData(Array.empty[Any])
    val charOff = new Array[Int](numChars + 1)
    var i = 0
    off = 0
    while (off < nb) {
      charOff(i) = off
      i += 1
      off += UTF8String.numBytesForFirstByte(b(off))
    }
    charOff(numChars) = nb
    val out = new java.util.ArrayList[AnyRef](8)
    var p = 0
    val last = numChars - w
    while (p <= last) {
      val s = charOff(p)
      val h = XXH64.hashUnsafeBytes(
        b, Platform.BYTE_ARRAY_OFFSET + s, charOff(p + w) - s, 42L)
      if (((h % modulus) + modulus) % modulus == 0)
        out.add(Integer.valueOf(p + 1))
      p += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** graft_cdc_boundaries(text, w, modulus): rolling-window CDC chunk
  * boundary positions, one codegen kernel call per row. */
case class CdcBoundaries(child: Expression, w: Int, modulus: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 1, s"window must be >= 1, got $w")
  require(modulus >= 1, s"modulus must be >= 1, got $modulus")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundariesKernel.eval(input.asInstanceOf[UTF8String], w, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundariesKernel.eval($c, $w, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}
