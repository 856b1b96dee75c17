package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector kernels (SURVEY §7.3:
  * "custom Expression ... if aggregate(zip_with(...)) proves too slow" —
  * it did: higher-order functions are CodegenFallback, so every pair
  * evaluated an interpreted zip_with + aggregate tree; these generate a
  * tight Java loop inside whole-stage codegen instead).
  *
  * Numerics are kept bit-identical to the HOF formulation the DuckDB
  * oracle was validated against: left-to-right double accumulation,
  * cosine = dot / (sqrt(normA) * sqrt(normB)) evaluated in that order.
  * Length mismatch yields NULL (zip_with pads the shorter side with
  * nulls, which nulls the HOF sum — same observable result).
  */
abstract class ArrayPairFold extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java statements: given `a`,`b` (ArrayData) and `n`, compute `result`
    * (double) or set `isNull`; also used by the interpreted path. */
  protected def foldEval(a: ArrayData, b: ArrayData, n: Int): Any
  protected def foldCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String, isNull: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else foldEval(a, b, a.numElements())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${foldCode(ctx, a, b, n, ev.value.toString, ev.isNull.toString)}
         |}
       """.stripMargin
    })
}

/** graft_dot(a, b): Σ aᵢ·bᵢ at double precision, codegen'd. */
case class ArrayDotProduct(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_dot"

  override protected def foldEval(a: ArrayData, b: ArrayData, n: Int): Any = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def foldCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String, isNull: String): String = {
    // all locals fresh-named: two kernels can share one generated scope
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $isNull = true; break; }
       |  $acc += $a.getDouble($i) * $b.getDouble($i);
       |}
       |if (!$isNull) $result = $acc;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_cosine(a, b): dot/(‖a‖·‖b‖) in one pass, codegen'd. A zero-norm
  * operand (denominator 0.0) yields NULL — matching Spark's non-ANSI
  * `Divide`, which NULLs on a zero divisor, so the [[graft.plans.VectorKernelRule]]
  * rewrite of the HOF quotient stays result-exact even for zero vectors
  * (Java's bare 0/0 ⇒ NaN would instead sort ABOVE every real similarity
  * in a descending top-k). */
case class ArrayCosineSim(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_cosine"

  override protected def foldEval(a: ArrayData, b: ArrayData, n: Int): Any = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def foldCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String, isNull: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val denom = ctx.freshName("denom")
    s"""
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $isNull = true; break; }
       |  double $x = $a.getDouble($i); double $y = $b.getDouble($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
       |if ($denom == 0.0) $isNull = true;
       |if (!$isNull) $result = $dot / $denom;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_l2(a, b): Σ (aᵢ−bᵢ)² at double precision, codegen'd — the
  * distance fold of k-means / PQ. Bit-identical to the HOF form
  * `aggregate(zip_with(a,b,(x,y)->(x-y)*(x-y)), 0.0, (acc,e)->acc+e)`:
  * left-to-right double accumulation, and the per-element subtract/square
  * are the same IEEE ops in the same order. NULL on length mismatch or a
  * null element, like [[ArrayDotProduct]]. */
case class ArrayL2Sq(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_l2"

  override protected def foldEval(a: ArrayData, b: ArrayData, n: Int): Any = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def foldCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String, isNull: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $isNull = true; break; }
       |  double $d = $a.getDouble($i) - $b.getDouble($i);
       |  $acc += $d * $d;
       |}
       |if (!$isNull) $result = $acc;
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_hyperplane_sig(v, bits, tableSeed): random-hyperplane LSH
  * signature with ±1 components, one pass over the vector. The sign
  * matrix (bits × dim) is a deterministic function of (seed, bit, j)
  * derived driver-side with splitmix64 and embedded as a codegen
  * reference object — the generated loop is sign-flip adds, no hashing
  * per element. dim adapts to the incoming vector (signs are generated
  * for up to `MaxDim` dims). */
case class HyperplaneSignature(child: Expression, bits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  import HyperplaneSignature._

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  // signs(b*MaxDim + j) == true → +x, false → -x
  @transient private lazy val signs: Array[Boolean] = signMatrix(bits, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), MaxDim)
    var sig = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (!v.isNullAt(j)) {
          val x = v.getDouble(j)
          acc += (if (signs(b * MaxDim + j)) x else -x)
        }
        j += 1
      }
      if (acc >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "boolean[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), ${MaxDim});
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$v.isNullAt($j)) {
         |      double $x = $v.getDouble($j);
         |      $acc += $signsRef[$b * ${MaxDim} + $j] ? $x : -$x;
         |    }
         |  }
         |  if ($acc >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override def prettyName: String = "graft_hyperplane_sig"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Hyperplanes support vectors up to this many dims (beyond it, trailing
    * dims are ignored — acceptable for an LSH prefilter; raise if needed). */
  val MaxDim = 512

  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def signMatrix(bits: Int, seed: Long): Array[Boolean] = {
    val out = new Array[Boolean](bits * MaxDim)
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < MaxDim) {
        out(b * MaxDim + j) = (mix(seed * 1000003L + b.toLong * MaxDim + j) & 1L) == 1L
        j += 1
      }
      b += 1
    }
    out
  }
}

/** graft_centroid_argmax(v, centsFlat, bias): index of the centroid with
  * the highest score(v, c_j) = Σᵢ vᵢ·c_jᵢ − bias_j, ties toward the lower
  * index — the k-means assignment kernel. The centroid matrix and bias
  * vector arrive as array LITERALS (they are per-iteration constants) and
  * are unpacked driver-side into flat double[] codegen reference objects,
  * so the generated code is one k×dim multiply-add loop nest per row and
  * the PLAN stays constant-size however large k·dim grows — this is the
  * "move the argmax into a custom codegen Expression" escape hatch the
  * literal zip_with formulation documents for k·dim beyond ~10⁶.
  *
  * Numerics are bit-identical to the HOF form (left-to-right double
  * accumulation per centroid, strict `>` keeps the earliest index on
  * ties — matching array_max over (score, −j) structs); pinned both ways
  * in DedupSimilaritySpec. A vector whose length differs from dim (or
  * with a null element, or k = 0) yields NULL, mirroring the null-ing
  * zip_with pad. */
case class CentroidArgmax(child: Expression, cents: Array[Double],
    bias: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  private val k = bias.length
  private val dim = if (k == 0) 0 else cents.length / k
  require(k == 0 || cents.length == k * dim,
    s"centroid matrix length ${cents.length} not divisible by k=$k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (k == 0 || v.numElements() != dim) return null
    var bestJ = -1
    var best = 0.0
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        acc += v.getDouble(i) * cents(j * dim + i)
        i += 1
      }
      val s = acc - bias(j)
      if (j == 0 || s > best) { best = s; bestJ = j }
      j += 1
    }
    bestJ
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
    val biasRef = ctx.addReferenceObj("bias", bias, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val bestJ = ctx.freshName("bestJ"); val best = ctx.freshName("best")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      s"""
         |if ($k == 0 || $v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $bestJ = -1; double $best = 0.0;
         |  for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      $acc += $v.getDouble($i) * $centsRef[$j * $dim + $i];
         |    }
         |    double $s = $acc - $biasRef[$j];
         |    if ($j == 0 || $s > $best) { $best = $s; $bestJ = $j; }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $bestJ;
         |}
       """.stripMargin
    })
  }

  override def prettyName: String = "graft_centroid_argmax"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Array-valued fields would make default equals reference-based; plans
  // with re-derived (equal) matrices must still compare/canonicalize equal
  override def equals(other: Any): Boolean = other match {
    case c: CentroidArgmax => child == c.child &&
      java.util.Arrays.equals(cents, c.cents) &&
      java.util.Arrays.equals(bias, c.bias)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.util.Arrays.hashCode(cents),
      java.util.Arrays.hashCode(bias))
}

/** Registration via SparkSessionExtensions (the documented extension
  * point); [[graft.Sessions.builder]] wires it in, so every engine
  * session resolves `graft_dot` / `graft_cosine`. */
object VectorExpressions {
  private def desc(name: String, clazz: Class[_], builder: FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name),
      builder)

  def inject(e: SparkSessionExtensions): Unit = {
    e.injectFunction(desc("graft_dot", classOf[ArrayDotProduct],
      (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1))))
    e.injectFunction(desc("graft_cosine", classOf[ArrayCosineSim],
      (children: Seq[Expression]) => ArrayCosineSim(children(0), children(1))))
    e.injectFunction(desc("graft_l2", classOf[ArrayL2Sq],
      (children: Seq[Expression]) => ArrayL2Sq(children(0), children(1))))
    e.injectFunction(desc("graft_hyperplane_sig", classOf[HyperplaneSignature],
      (children: Seq[Expression]) => {
        def lit(i: Int): Long = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toLong
          case other => throw new IllegalArgumentException(
            s"graft_hyperplane_sig arg ${i + 1} must be a literal, got $other")
        }
        HyperplaneSignature(children(0), lit(1).toInt, lit(2))
      }))
    e.injectFunction(desc("graft_shingles", classOf[TokenShingles],
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingles arg 2 must be a literal, got $other")
        }
        TokenShingles(children(0), n)
      }))
    e.injectFunction(desc("graft_winnow", classOf[WinnowFingerprints],
      (children: Seq[Expression]) => {
        def intLit(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_winnow arg ${i + 1} must be a literal, got $other")
        }
        WinnowFingerprints(children(0), intLit(1), intLit(2))
      }))
    e.injectFunction(desc("graft_shingle_hashes", classOf[TokenShingleHashes],
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingle_hashes arg 2 must be a literal, got $other")
        }
        TokenShingleHashes(children(0), n)
      }))
    e.injectFunction(desc("graft_simhash", classOf[SimhashSignature],
      (children: Seq[Expression]) => SimhashSignature(children(0))))
    e.injectFunction(desc("graft_term_counts", classOf[TermCounts],
      (children: Seq[Expression]) => TermCounts(children(0))))
    e.injectFunction(desc("graft_centroid_argmax", classOf[CentroidArgmax],
      (children: Seq[Expression]) => {
        def arrLit(i: Int): Array[Double] = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, ArrayType(DoubleType, _)) =>
            val a = v.asInstanceOf[ArrayData]
            a.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"graft_centroid_argmax arg ${i + 1} must be an array<double> literal, got $other")
        }
        CentroidArgmax(children(0), arrLit(1), arrLit(2))
      }))
    // shared dictionary/backend extraction for the two blocklist kernels.
    // Function resolution runs before constant folding, so a small
    // dictionary arrives as CreateArray(literals); a pre-folded array
    // Literal is accepted too; and a LARGE dictionary arrives NUL-joined
    // in ONE string literal (constant-size plan node; see TextFunctions -
    // a 100k-element CreateArray costs ~20 s of analyzer/optimizer walks).
    def multiPatternArgs(fn: String, children: Seq[Expression]): (Seq[String], String) = {
      import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
      val pats = children(1) match {
        case CreateArray(elems, _) if elems.forall(_.isInstanceOf[Literal]) =>
          // a lit(null) element would otherwise NPE on v.toString deep in
          // resolution - reject it with the error the require intends
          elems.map {
            case Literal(null, _) => throw new IllegalArgumentException(
              s"$fn patterns must not contain null literals")
            case Literal(v, _) => v.toString
          }
        case Literal(v, ArrayType(t, _))
            if t == org.apache.spark.sql.types.StringType =>
          v.asInstanceOf[ArrayData].toArray[org.apache.spark.unsafe.types.UTF8String](t)
            .map(_.toString).toSeq
        case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
          scala.collection.immutable.ArraySeq.unsafeWrapArray(
            v.toString.split("\u0000"))
        case other => throw new IllegalArgumentException(
          s"$fn arg 2 must be an array<string> literal, got $other")
      }
      val backend =
        if (children.size < 3) "auto"
        else children(2) match {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"$fn arg 3 must be a string literal, got $other")
        }
      (pats, backend)
    }
    e.injectFunction(desc("graft_multi_count", classOf[MultiPatternCounts],
      (children: Seq[Expression]) => {
        val (pats, backend) = multiPatternArgs("graft_multi_count", children)
        MultiPatternCounts(children(0), pats, backend)
      }))
    e.injectFunction(desc("graft_multi_hits", classOf[MultiPatternHits],
      (children: Seq[Expression]) => {
        val (pats, backend) = multiPatternArgs("graft_multi_hits", children)
        MultiPatternHits(children(0), pats, backend)
      }))
    e.injectFunction(desc("graft_cdc_boundaries", classOf[CdcBoundaries],
      (children: Seq[Expression]) => {
        def intLit(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_cdc_boundaries arg ${i + 1} must be a literal, got $other")
        }
        CdcBoundaries(children(0), intLit(1), intLit(2))
      }))
    e.injectFunction(desc("graft_shingle_sketch", classOf[ShingleSketch],
      (children: Seq[Expression]) => {
        def intLit(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_shingle_sketch arg ${i + 1} must be a literal, got $other")
        }
        ShingleSketch(children(0), intLit(1), intLit(2))
      }))
    e.injectFunction(desc("graft_seg_keys", classOf[SegKeys],
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.catalyst.util.MapData
        import org.apache.spark.sql.types.{IntegerType, MapType}
        val tau = children(1) match {
          case Literal(v, _) if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_seg_keys arg 2 must be an int literal, got $other")
        }
        val bounds: Map[Int, IndexedSeq[Int]] = children(2) match {
          case Literal(m: MapData, MapType(IntegerType, ArrayType(IntegerType, _), _)) =>
            val keys = m.keyArray().toIntArray()
            val vals = m.valueArray()
            keys.indices.map(i =>
              keys(i) -> vals.getArray(i).toIntArray().toIndexedSeq).toMap
          case Literal(null, _) => Map.empty
          case other => throw new IllegalArgumentException(
            s"graft_seg_keys arg 3 must be a map<int,array<int>> literal, got $other")
        }
        SegKeys(children(0), tau, bounds)
      }))
    e.injectFunction(desc("graft_adc_tables", classOf[AdcTables],
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        def arrLit(i: Int): Array[Double] = children(i) match {
          case Literal(v, ArrayType(DoubleType, _)) =>
            v.asInstanceOf[ArrayData].toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"graft_adc_tables arg ${i + 1} must be an array<double> literal, got $other")
        }
        def intArrLit(i: Int): Array[Int] = children(i) match {
          case Literal(v, ArrayType(IntegerType, _)) =>
            v.asInstanceOf[ArrayData].toIntArray()
          case other => throw new IllegalArgumentException(
            s"graft_adc_tables arg ${i + 1} must be an array<int> literal, got $other")
        }
        def intLit(i: Int): Int = children(i) match {
          case Literal(v, _) if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_adc_tables arg ${i + 1} must be an int literal, got $other")
        }
        def boolLit(i: Int): Boolean = children(i) match {
          case Literal(v, _) if v != null => v.toString.toBoolean
          case other => throw new IllegalArgumentException(
            s"graft_adc_tables arg ${i + 1} must be a boolean literal, got $other")
        }
        AdcTables(children(0), arrLit(1), intArrLit(2), intLit(3), boolLit(4))
      }))
    e.injectFunction(desc("graft_centroid_topk", classOf[CentroidTopK],
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        def arrLit(i: Int): Array[Double] = children(i) match {
          case Literal(v, ArrayType(DoubleType, _)) =>
            v.asInstanceOf[ArrayData].toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"graft_centroid_topk arg ${i + 1} must be an array<double> literal, got $other")
        }
        val nprobe = children(3) match {
          case Literal(v, _) if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_centroid_topk arg 4 must be an int literal, got $other")
        }
        CentroidTopK(children(0), arrLit(1), arrLit(2), nprobe)
      }))
    e.injectFunction(desc("graft_residual", classOf[CoarseResidual],
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        val cents = children(2) match {
          case Literal(v, ArrayType(DoubleType, _)) =>
            v.asInstanceOf[ArrayData].toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"graft_residual arg 3 must be an array<double> literal, got $other")
        }
        val k = children(3) match {
          case Literal(v, _) if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"graft_residual arg 4 must be an int literal, got $other")
        }
        CoarseResidual(children(0), children(1), cents, k)
      }))
  }
}
