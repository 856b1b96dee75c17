package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher over raw UTF-8 bytes — the
  * blocklist/badword/boilerplate-phrase scan a curation pipeline runs
  * over every document. One automaton walk per row counts ALL patterns
  * simultaneously: O(len + matches) per document regardless of
  * dictionary size, where the naive formulation is one regex/contains
  * pass PER TERM (O(|dict|·len) — a 10⁴-term blocklist would scan each
  * 100 TB of text ten thousand times).
  *
  * Built once driver-side and shipped to executors as a codegen
  * reference object (same pattern as [[CentroidArgmax]]'s matrices), so
  * the generated code is a single byte loop + table lookups.
  *
  * Matching semantics: raw byte substring match (no word boundaries,
  * case-sensitive — compose with `lower()` upstream for case-folding);
  * every occurrence is counted, including overlapping occurrences and
  * patterns nested inside other patterns (the suffix-link outputs).
  * For patterns with no border (no proper prefix that is also a suffix
  * — true of any multi-word phrase whose first and last words differ),
  * this equals the non-overlapping count
  * `(len(text) − len(replace(text, pat, ''))) / len(pat)`, which is the
  * DuckDB-oracle twin.
  *
  * Memory: dense byte-indexed transition rows (1 KiB per trie node) —
  * the right trade for codegen-hot scanning of dictionaries up to
  * ~10⁴–10⁵ nodes (a few thousand typical blocklist terms). Past that,
  * swap the row store for a double-array trie; the walk loop is
  * unchanged.
  */
final class AcAutomaton(patterns: Array[Array[Byte]]) extends Serializable {
  val nPatterns: Int = patterns.length

  // next(state << 8 | byte) = goto state; outs(state) = pattern ids ending
  // here (suffix-link outputs flattened at build), null when none.
  private val (next: Array[Int], outs: Array[Array[Int]]) = {
    val maxNodes = 1 + patterns.map(_.length).sum
    val nx = Array.fill(maxNodes << 8)(-1)
    val ends = new Array[scala.collection.mutable.ArrayBuffer[Int]](maxNodes)
    var nNodes = 1
    var p = 0
    while (p < patterns.length) {
      var st = 0
      val pat = patterns(p)
      var i = 0
      while (i < pat.length) {
        val c = pat(i) & 0xff
        if (nx((st << 8) | c) == -1) { nx((st << 8) | c) = nNodes; nNodes += 1 }
        st = nx((st << 8) | c)
        i += 1
      }
      if (ends(st) == null) ends(st) = scala.collection.mutable.ArrayBuffer.empty
      ends(st) += p
      p += 1
    }
    // BFS: fail links + dense goto + flattened outputs
    val fail = new Array[Int](nNodes)
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val v = nx(c)
      if (v == -1) nx(c) = 0
      else { fail(v) = 0; queue.add(v) }
      c += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      val fu = fail(u)
      if (ends(fu) != null) {
        if (ends(u) == null) ends(u) = scala.collection.mutable.ArrayBuffer.empty
        ends(u) ++= ends(fu)
      }
      var b = 0
      while (b < 256) {
        val v = nx((u << 8) | b)
        if (v == -1) nx((u << 8) | b) = nx((fu << 8) | b)
        else { fail(v) = nx((fu << 8) | b); queue.add(v) }
        b += 1
      }
    }
    val flat = new Array[Array[Int]](nNodes)
    var s = 0
    while (s < nNodes) {
      if (ends(s) != null) flat(s) = ends(s).toArray
      s += 1
    }
    (java.util.Arrays.copyOf(nx, nNodes << 8), flat)
  }

  /** Per-pattern occurrence counts over `text`, one automaton walk. */
  def counts(text: UTF8String): ArrayData = {
    val out = new Array[Int](nPatterns)
    val bytes = text.getBytes
    var st = 0
    var i = 0
    while (i < bytes.length) {
      st = next((st << 8) | (bytes(i) & 0xff))
      val os = outs(st)
      if (os != null) {
        var k = 0
        while (k < os.length) { out(os(k)) += 1; k += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_multi_count(text, array('pat', …)): per-pattern occurrence
  * counts (array<int>, positionally aligned with the pattern list) in one
  * Aho–Corasick pass per row. Patterns must be a string-array literal —
  * the dictionary is a plan-time constant, like the centroid matrices. */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_multi_count needs a non-empty list of non-empty patterns")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_multi_count"

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def nullSafeEval(input: Any): Any =
    ac.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}
