package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass ADC table kernel: the per-query m×k_j lookup tables of a
  * product-quantization probe — element j of the outer array is
  * subspace j's table, entry c the squared L2 distance (or, in dot
  * mode, the partial dot product) from the query's j-th subvector to
  * codeword c. Exactly the HOF formulation it replaces
  * (`transform(cbLit, c -> aggregate(zip_with(subV, c, …), 0.0, +))`
  * per subspace in [[graft.ops.Similarity]]).
  *
  * Why a native expression (r18 verdict item 2): the HOF form carries
  * one zip_with/aggregate tree PER SUBSPACE with the full codebook as
  * an O(k·sub) array literal — plan size and per-row lambda machinery
  * grow with m·k. Here the codebooks ride as ONE flat double[] codegen
  * reference object and the whole m×k×sub table is one loop nest per
  * row.
  *
  * Bit-fidelity with the HOF form (DedupSimilaritySpec pins it):
  *   - left-to-right double accumulation from 0.0, (x−y)·(x−y) resp.
  *     x·y per element — the same IEEE op sequence as the fold;
  *   - a subvector that is incomplete (vector shorter than
  *     (j+1)·sub) or contains a null element yields a NULL table entry
  *     for every codeword of that subspace (the zip_with null pad
  *     nulls the fold);
  *   - per-subspace codeword counts k_j may differ (pqTrain drops
  *     empty clusters) — inner array lengths match the codebooks.
  * A NULL input vector yields NULL (the HOF yields m arrays of nulls;
  * every consumer is an `element_at` chain that maps both to the same
  * NULL distance, and the table column never escapes the query).
  */
object AdcTablesKernel {
  /** `flat` is the j-major concatenation of all codewords; `offs(j)` is
    * the flat start of subspace j's codebook, `ks(j)` its codeword
    * count, `sub` the codeword length. */
  def eval(v: ArrayData, flat: Array[Double], ks: Array[Int],
      offs: Array[Int], sub: Int, squared: Boolean): ArrayData = {
    val m = ks.length
    val n = v.numElements()
    val outer = new Array[AnyRef](m)
    val x = new Array[Double](sub)
    var j = 0
    while (j < m) {
      val base = j * sub
      val inner = new Array[AnyRef](ks(j))
      var complete = n >= base + sub
      var i = 0
      while (complete && i < sub) {
        if (v.isNullAt(base + i)) complete = false
        else x(i) = v.getDouble(base + i)
        i += 1
      }
      if (complete) {
        var c = 0
        while (c < ks(j)) {
          val cbase = offs(j) + c * sub
          var acc = 0.0
          var p = 0
          if (squared) {
            while (p < sub) {
              val d = x(p) - flat(cbase + p)
              acc += d * d
              p += 1
            }
          } else {
            while (p < sub) {
              acc += x(p) * flat(cbase + p)
              p += 1
            }
          }
          inner(c) = java.lang.Double.valueOf(acc)
          c += 1
        }
      }
      outer(j) = new GenericArrayData(inner)
      j += 1
    }
    new GenericArrayData(outer)
  }
}

/** graft_adc_tables(v, flatCodebooks, ks, sub, squared): the per-query
  * ADC lookup tables against literal PQ codebooks — `array<array<double>>`,
  * outer length m = |ks|, inner length ks(j). Codebooks arrive as one
  * flat array<double> literal (unpacked into a codegen reference
  * object), so the plan stays constant-size however large m·k grows. */
case class AdcTables(child: Expression, flat: Array[Double],
    ks: Array[Int], sub: Int, squared: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(sub > 0, s"sub must be positive, got $sub")
  require(flat.length == ks.map(_ * sub).sum,
    s"flat codebook length ${flat.length} != Σ k_j·sub = ${ks.map(_ * sub).sum}")

  private val offs: Array[Int] = ks.scanLeft(0)(_ + _ * sub).init

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_adc_tables"

  override def nullSafeEval(input: Any): Any =
    AdcTablesKernel.eval(input.asInstanceOf[ArrayData], flat, ks, offs,
      sub, squared)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    val ksRef = ctx.addReferenceObj("ks", ks, "int[]")
    val offsRef = ctx.addReferenceObj("offs", offs, "int[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.AdcTablesKernel.eval($v, $flatRef, $ksRef, " +
        s"$offsRef, $sub, $squared)")
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTables =
    copy(child = newChild)

  // Array-valued fields would make default equals reference-based; plans
  // with re-derived (equal) codebooks must still compare/canonicalize equal
  override def equals(other: Any): Boolean = other match {
    case a: AdcTables => child == a.child && sub == a.sub &&
      squared == a.squared && java.util.Arrays.equals(flat, a.flat) &&
      java.util.Arrays.equals(ks, a.ks)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.util.Arrays.hashCode(flat),
      java.util.Arrays.hashCode(ks), Integer.valueOf(sub),
      java.lang.Boolean.valueOf(squared))
}

/** The coarse-residual kernel: `v − c[cell]` elementwise against a
  * literal centroid matrix indexed by a COMPUTED cell column — the last
  * zip_with-over-centroid-literal node in the IVFADC plans after
  * [[AdcTables]]/[[CentroidTopK]] (r19). Bit-fidelity with the HOF form
  * `zip_with(vd, element_at(centsLit, cell+1), (x, c) => x − c)`:
  *   - output length = max(|v|, dim), zip_with's null padding: element
  *     i is NULL when either side has no value (or has a null) there;
  *   - a NULL cell or NULL vector yields NULL (zip_with over a null
  *     side). Cells outside 0..k−1 cannot occur (they come from the
  *     argmax/topk kernels); were one to, the kernel yields an all-null
  *     row where ANSI element_at would error — out of contract either
  *     way, decided toward the non-throwing arm.
  */
object ResidualKernel {
  def eval(v: ArrayData, cell: Int, cents: Array[Double],
      k: Int): ArrayData = {
    val dim = if (k == 0) 0 else cents.length / k
    val inRange = cell >= 0 && cell < k
    val n = v.numElements()
    val len = math.max(n, dim)
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      out(i) =
        if (i < n && i < dim && inRange && !v.isNullAt(i))
          java.lang.Double.valueOf(v.getDouble(i) - cents(cell * dim + i))
        else null
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_residual(v, cell, centsFlat, k): `v − c[cell]` with the
  * centroid matrix as a codegen reference object. */
case class CoarseResidual(left: Expression, right: Expression,
    cents: Array[Double], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_residual"

  override def nullSafeEval(v: Any, cell: Any): Any =
    ResidualKernel.eval(v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], cents, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    defineCodeGen(ctx, ev, (v, cell) =>
      s"graft.functions.ResidualKernel.eval($v, $cell, $centsRef, $k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CoarseResidual =
    copy(left = newLeft, right = newRight)

  override def equals(other: Any): Boolean = other match {
    case c: CoarseResidual => left == c.left && right == c.right &&
      k == c.k && java.util.Arrays.equals(cents, c.cents)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right,
      java.util.Arrays.hashCode(cents), Integer.valueOf(k))
}

/** The coarse-probe cell ranking kernel: indices of the `nprobe`
  * highest-scoring centroids (score = v·c_j − bias_j, descending, ties
  * to the lower index) — the nprobe generalization of
  * [[CentroidArgmax]], replacing the zip_with-over-centroid-literal +
  * array_sort HOF tree in the IVFADC probes (r18 verdict item 2's last
  * remaining literal tree).
  *
  * Bit-fidelity with the HOF form (DedupSimilaritySpec pins it):
  *   - scores accumulate left-to-right at double precision, minus the
  *     bias, exactly like the fold;
  *   - ordering matches Spark's comparator semantics: NaN ranks above
  *     every double, NaN ties NaN, and ±0.0 compare equal (scores are
  *     +0.0-normalized before java.lang.Double.compare);
  *   - a NULL/mis-sized vector or a null element nulls EVERY score in
  *     the HOF form, whose comparator then falls through to the index
  *     tiebreak — i.e. indices 0..nprobe−1 — which the kernel returns
  *     for those inputs;
  *   - k = 0 yields an empty array; nprobe > k yields all k indices.
  */
object CentroidTopKKernel {
  def eval(v: ArrayData, cents: Array[Double], bias: Array[Double],
      nprobe: Int): ArrayData = {
    val k = bias.length
    val n = math.min(nprobe, k)
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val dim = cents.length / k
    // a NULL vector nulls every score in the HOF form, whose comparator
    // then falls through to the index tiebreak — same as the mis-sized
    // case below, so both take the 0..n−1 path
    var valid = v != null && v.numElements() == dim
    var i = 0
    while (valid && i < dim) {
      if (v.isNullAt(i)) valid = false
      i += 1
    }
    val out = new Array[Any](n)
    if (!valid) {
      var j = 0
      while (j < n) { out(j) = j; j += 1 }
      return new GenericArrayData(out)
    }
    val scores = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var p = 0
      while (p < dim) {
        acc += v.getDouble(p) * cents(j * dim + p)
        p += 1
      }
      scores(j) = (acc - bias(j)) + 0.0 // -0.0 → 0.0: Spark's > treats them equal
      j += 1
    }
    val order = new Array[Integer](k)
    j = 0
    while (j < k) { order(j) = Integer.valueOf(j); j += 1 }
    java.util.Arrays.sort(order, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(scores(b), scores(a)) // desc, NaN first
      if (c != 0) c else Integer.compare(a, b)
    })
    j = 0
    while (j < n) { out(j) = order(j).intValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** graft_centroid_topk(v, centsFlat, bias, nprobe): the nprobe
  * best-scoring centroid indices — see [[CentroidTopKKernel]]. The
  * centroid matrix and bias ride as codegen reference objects, so the
  * plan stays constant-size in k·dim. */
case class CentroidTopK(child: Expression, cents: Array[Double],
    bias: Array[Double], nprobe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
  private val k = bias.length
  require(k == 0 || cents.length == k * (cents.length / k),
    s"centroid matrix length ${cents.length} not divisible by k=$k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  // never null: a NULL input takes the all-scores-null fallthrough
  // (indices 0..nprobe−1), exactly like the HOF form it replaces
  override def nullable: Boolean = false
  override def prettyName: String = "graft_centroid_topk"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    CentroidTopKKernel.eval(
      if (v == null) null else v.asInstanceOf[ArrayData], cents, bias, nprobe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    val biasRef = ctx.addReferenceObj("bias", bias, "double[]")
    val c = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.CentroidTopKKernel.eval(
          ${c.isNull} ? null : ${c.value}, $centsRef, $biasRef, $nprobe);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case c: CentroidTopK => child == c.child && nprobe == c.nprobe &&
      java.util.Arrays.equals(cents, c.cents) &&
      java.util.Arrays.equals(bias, c.bias)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.util.Arrays.hashCode(cents),
      java.util.Arrays.hashCode(bias), Integer.valueOf(nprobe))
}
