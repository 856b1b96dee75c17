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
  * Two transition-table backends behind the same walk API (r12; the
  * automatic switch is on trie size, overridable for benchmarks):
  *   - '''dense''': fully-resolved goto rows, 256 ints (1 KiB) per node
  *     — one array load per input byte, the right trade up to ~32 K
  *     nodes (≤ 32 MiB of rows; typical blocklists of a few thousand
  *     terms live here);
  *   - '''csr''': per-node sorted (label → target) edge lists in CSR
  *     layout (~13 B per node) walked with classic fail links and a
  *     fully-resolved dense ROOT row — amortized O(len) per document
  *     (the fail chain only descends depth accumulated by matches), at
  *     ~1/80th the dense memory. A 10⁵-term dictionary that would need
  *     ~1 GiB of dense rows is ~15 MiB of CSR tables, and shipping it
  *     to executors stays a broadcast-sized reference object.
  */
final class AcAutomaton(patterns: Array[Array[Byte]], backendChoice: String = "auto")
    extends Serializable {
  val nPatterns: Int = patterns.length

  // ---- compact trie build (memory ~ O(total pattern bytes), no 256-wide
  // rows during construction — the r11 build allocated maxNodes KiB even
  // when the final automaton was small) ----
  private val t = AcAutomaton.build(patterns, backendChoice)

  /** true when the dense fully-resolved goto backend was materialized. */
  def isDense: Boolean = t.dense
  def nNodes: Int = t.nNodes

  /** Approximate retained table bytes — the number that decides whether a
    * dictionary ships comfortably to executors. */
  def approxBytes: Long = {
    val outs = 4L * (t.outStart.length + t.outIds.length)
    if (t.dense) 4L * t.next.length + outs
    else 4L * (t.fail.length + t.csrStart.length + t.csrTarget.length + 256) +
      t.csrLabel.length + outs
  }

  /** Per-pattern occurrence counts over `text`, one automaton walk. */
  def counts(text: UTF8String): ArrayData = {
    val out = new Array[Int](nPatterns)
    val bytes = text.getBytes
    val n = bytes.length
    var st = 0
    var i = 0
    if (t.dense) {
      val next = t.next
      val outStart = t.outStart
      val outIds = t.outIds
      while (i < n) {
        st = next((st << 8) | (bytes(i) & 0xff))
        var k = outStart(st)
        val e = outStart(st + 1)
        while (k < e) { out(outIds(k)) += 1; k += 1 }
        i += 1
      }
    } else {
      val rootNext = t.rootNext
      val fail = t.fail
      val outStart = t.outStart
      val outIds = t.outIds
      while (i < n) {
        val c = bytes(i) & 0xff
        var nxt = -1
        while (nxt == -1) {
          if (st == 0) nxt = rootNext(c)
          else {
            val f = csrFind(st, c)
            if (f != -1) nxt = f else st = fail(st)
          }
        }
        st = nxt
        var k = outStart(st)
        val e = outStart(st + 1)
        while (k < e) { out(outIds(k)) += 1; k += 1 }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  // per-thread scratch for the sparse hits() path: a zeroed counts array
  // reused across rows (only touched entries are reset, so a row costs
  // O(len + matches), never O(nPatterns))
  @transient private lazy val scratch =
    ThreadLocal.withInitial[(Array[Int], Array[Int])](() =>
      (new Array[Int](nPatterns), new Array[Int](nPatterns)))

  /** Sparse per-pattern hits: `array<struct<pat_id,cnt>>` of only the
    * patterns that occur, pat_id ascending. THE large-dictionary output
    * shape — [[counts]]' dense vector is O(|dict|) per row to allocate,
    * fill, and downstream-scan (400 KB per document at 10⁵ terms), which
    * silently re-linearizes the O(len + matches) walk; this emits only
    * matches. */
  def hits(text: UTF8String): ArrayData = {
    val (cnt, touched) = scratch.get()
    var nTouched = 0
    // the finally (not the row-build loop) owns the scratch reset: if
    // anything escapes mid-walk or mid-build (e.g. OOM on the row array),
    // a dirty cnt would poison every later row on this reused task thread
    try {
    val bytes = text.getBytes
    val n = bytes.length
    var st = 0
    var i = 0
    val outStart = t.outStart
    val outIds = t.outIds
    if (t.dense) {
      val next = t.next
      while (i < n) {
        st = next((st << 8) | (bytes(i) & 0xff))
        var k = outStart(st)
        val e = outStart(st + 1)
        while (k < e) {
          val id = outIds(k)
          if (cnt(id) == 0) { touched(nTouched) = id; nTouched += 1 }
          cnt(id) += 1
          k += 1
        }
        i += 1
      }
    } else {
      val rootNext = t.rootNext
      val fail = t.fail
      while (i < n) {
        val c = bytes(i) & 0xff
        var nxt = -1
        while (nxt == -1) {
          if (st == 0) nxt = rootNext(c)
          else {
            val f = csrFind(st, c)
            if (f != -1) nxt = f else st = fail(st)
          }
        }
        st = nxt
        var k = outStart(st)
        val e = outStart(st + 1)
        while (k < e) {
          val id = outIds(k)
          if (cnt(id) == 0) { touched(nTouched) = id; nTouched += 1 }
          cnt(id) += 1
          k += 1
        }
        i += 1
      }
    }
    java.util.Arrays.sort(touched, 0, nTouched)
    val rows = new Array[AnyRef](nTouched)
    var j = 0
    while (j < nTouched) {
      val id = touched(j)
      rows(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](id, cnt(id)))
      j += 1
    }
    new GenericArrayData(rows)
    } finally {
      var j = 0
      while (j < nTouched) { cnt(touched(j)) = 0; j += 1 }
    }
  }

  // binary search the node's sorted edge list; -1 when absent
  private def csrFind(s: Int, c: Int): Int = {
    var lo = t.csrStart(s)
    var hi = t.csrStart(s + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val l = t.csrLabel(mid) & 0xff
      if (l == c) return t.csrTarget(mid)
      else if (l < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }
}

private[functions] final case class AcTables(
    dense: Boolean,
    nNodes: Int,
    next: Array[Int],       // dense backend: resolved goto rows (nNodes<<8)
    rootNext: Array[Int],   // csr backend: resolved root row (256)
    fail: Array[Int],       // csr backend
    csrStart: Array[Int],
    csrLabel: Array[Byte],
    csrTarget: Array[Int],
    outStart: Array[Int],   // both: flattened suffix-link outputs, CSR form
    outIds: Array[Int]) extends Serializable

object AcAutomaton {
  /** Dense rows cost 1 KiB/node; past this node budget (32 MiB of rows)
    * the CSR backend is selected automatically. */
  val DenseNodeLimit: Int = 1 << 15

  private[functions] def build(patterns: Array[Array[Byte]], choice: String): AcTables = {
    val cap = patterns.map(_.length).sum + 1
    // per-node growable child edge lists
    val labs = new Array[Array[Int]](cap)
    val tgts = new Array[Array[Int]](cap)
    val deg = new Array[Int](cap)
    def childOf(u: Int, c: Int): Int = {
      val ls = labs(u)
      var i = 0
      while (i < deg(u)) { if (ls(i) == c) return tgts(u)(i); i += 1 }
      -1
    }
    def addChild(u: Int, c: Int, v: Int): Unit = {
      if (labs(u) == null) { labs(u) = new Array[Int](2); tgts(u) = new Array[Int](2) }
      else if (deg(u) == labs(u).length) {
        labs(u) = java.util.Arrays.copyOf(labs(u), deg(u) * 2)
        tgts(u) = java.util.Arrays.copyOf(tgts(u), deg(u) * 2)
      }
      labs(u)(deg(u)) = c
      tgts(u)(deg(u)) = v
      deg(u) += 1
    }
    var nNodes = 1
    val ends = new Array[scala.collection.mutable.ArrayBuffer[Int]](cap)
    var p = 0
    while (p < patterns.length) {
      var st = 0
      val pat = patterns(p)
      var i = 0
      while (i < pat.length) {
        val c = pat(i) & 0xff
        var nx = childOf(st, c)
        if (nx == -1) { nx = nNodes; nNodes += 1; addChild(st, c, nx) }
        st = nx
        i += 1
      }
      if (ends(st) == null) ends(st) = scala.collection.mutable.ArrayBuffer.empty
      ends(st) += p
      p += 1
    }
    // BFS: fail links + flattened outputs (fail targets are strictly
    // shallower, so by poll time ends(fail(u)) is already flattened)
    val fail = new Array[Int](nNodes)
    val bfs = new Array[Int](nNodes)
    var head = 0
    var tail = 0
    def walkGoto(u0: Int, c: Int): Int = {
      var u = u0
      while (true) {
        val t = childOf(u, c)
        if (t != -1) return t
        if (u == 0) return 0
        u = fail(u)
      }
      0
    }
    var i0 = 0
    while (i0 < deg(0)) { val v = tgts(0)(i0); fail(v) = 0; bfs(tail) = v; tail += 1; i0 += 1 }
    while (head < tail) {
      val u = bfs(head)
      head += 1
      val fu = fail(u)
      if (ends(fu) != null) {
        if (ends(u) == null) ends(u) = scala.collection.mutable.ArrayBuffer.empty
        ends(u) ++= ends(fu)
      }
      var i = 0
      while (i < deg(u)) {
        val v = tgts(u)(i)
        fail(v) = walkGoto(fu, labs(u)(i))
        bfs(tail) = v
        tail += 1
        i += 1
      }
    }
    // flattened outputs, CSR layout (used by both backends)
    val outStart = new Array[Int](nNodes + 1)
    var s = 0
    while (s < nNodes) {
      outStart(s + 1) = outStart(s) + (if (ends(s) == null) 0 else ends(s).size)
      s += 1
    }
    val outIds = new Array[Int](outStart(nNodes))
    s = 0
    while (s < nNodes) {
      val es = ends(s)
      if (es != null) {
        var k = 0
        while (k < es.size) { outIds(outStart(s) + k) = es(k); k += 1 }
      }
      s += 1
    }
    val rootNext = new Array[Int](256)
    var b0 = 0
    while (b0 < 256) {
      val t = childOf(0, b0)
      rootNext(b0) = if (t == -1) 0 else t
      b0 += 1
    }
    val dense = choice match {
      case "dense" =>
        // nNodes << 8 must stay a valid Int array size — past ~8.4M
        // nodes the shift wraps; fail fast with the real cause
        require(nNodes <= (Int.MaxValue >> 8),
          s"dense backend cannot hold $nNodes trie nodes (${nNodes.toLong << 8} ints); use csr")
        true
      case "csr" => false
      case _ => nNodes <= DenseNodeLimit
    }
    if (dense) {
      // resolve full goto rows in BFS order so next(fail(u)) exists first
      val next = new Array[Int](nNodes << 8)
      System.arraycopy(rootNext, 0, next, 0, 256)
      var qi = 0
      while (qi < tail) {
        val u = bfs(qi)
        val fu = fail(u)
        var b = 0
        while (b < 256) {
          val t = childOf(u, b)
          next((u << 8) | b) = if (t != -1) t else next((fu << 8) | b)
          b += 1
        }
        qi += 1
      }
      AcTables(dense = true, nNodes, next, rootNext, null, null, null, null,
        outStart, outIds)
    } else {
      val csrStart = new Array[Int](nNodes + 1)
      s = 0
      while (s < nNodes) { csrStart(s + 1) = csrStart(s) + deg(s); s += 1 }
      val csrLabel = new Array[Byte](csrStart(nNodes))
      val csrTarget = new Array[Int](csrStart(nNodes))
      s = 0
      while (s < nNodes) {
        // insertion-sort the node's few edges by unsigned label
        val d = deg(s)
        var i = 0
        while (i < d) {
          val l = labs(s)(i)
          val t = tgts(s)(i)
          var j = i - 1
          while (j >= 0 && labs(s)(j) > l) {
            labs(s)(j + 1) = labs(s)(j); tgts(s)(j + 1) = tgts(s)(j); j -= 1
          }
          labs(s)(j + 1) = l
          tgts(s)(j + 1) = t
          i += 1
        }
        i = 0
        while (i < d) {
          csrLabel(csrStart(s) + i) = labs(s)(i).toByte
          csrTarget(csrStart(s) + i) = tgts(s)(i)
          i += 1
        }
        s += 1
      }
      AcTables(dense = false, nNodes, null, rootNext, fail, csrStart, csrLabel,
        csrTarget, outStart, outIds)
    }
  }
}

/** graft_multi_count(text, array('pat', …)): per-pattern occurrence
  * counts (array<int>, positionally aligned with the pattern list) in one
  * Aho–Corasick pass per row. Patterns must be a string-array literal —
  * the dictionary is a plan-time constant, like the centroid matrices. */
case class MultiPatternCounts(child: Expression, patterns: Seq[String],
    backend: String = "auto")
    extends UnaryExpression with ImplicitCastInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_multi_count needs a non-empty list of non-empty patterns")
  require(Seq("auto", "dense", "csr").contains(backend),
    s"backend must be auto|dense|csr, got '$backend'")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_multi_count"

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray, backend)

  override def nullSafeEval(input: Any): Any =
    ac.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}

/** graft_multi_hits(text, dict, backend): sparse blocklist scan —
  * `array<struct<pat_id,cnt>>` of only the patterns that occur (pat_id =
  * position in the dictionary, ascending). The output the 100 TB path
  * needs: per-row work AND output are O(len + matches) regardless of
  * dictionary size, where [[MultiPatternCounts]]' dense vector costs
  * O(|dict|) per row just to materialize. */
case class MultiPatternHits(child: Expression, patterns: Seq[String],
    backend: String = "auto")
    extends UnaryExpression with ImplicitCastInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_multi_hits needs a non-empty list of non-empty patterns")
  require(Seq("auto", "dense", "csr").contains(backend),
    s"backend must be auto|dense|csr, got '$backend'")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pat_id", IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_multi_hits"

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray, backend)

  override def nullSafeEval(input: Any): Any =
    ac.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.hits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternHits =
    copy(child = newChild)
}
