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
  protected def foldCode(a: String, b: String, n: String,
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
         |  ${foldCode(a, b, n, ev.value.toString, ev.isNull.toString)}
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

  override protected def foldCode(a: String, b: String, n: String,
      result: String, isNull: String): String =
    s"""
       |double acc = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  if ($a.isNullAt(i) || $b.isNullAt(i)) { $isNull = true; break; }
       |  acc += $a.getDouble(i) * $b.getDouble(i);
       |}
       |if (!$isNull) $result = acc;
     """.stripMargin

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_cosine(a, b): dot/(‖a‖·‖b‖) in one pass, codegen'd. Division-by-
  * zero follows Java double semantics (NaN/Inf), matching the non-ANSI
  * HOF formulation. */
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
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def foldCode(a: String, b: String, n: String,
      result: String, isNull: String): String =
    s"""
       |double dot = 0.0; double na = 0.0; double nb = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  if ($a.isNullAt(i) || $b.isNullAt(i)) { $isNull = true; break; }
       |  double x = $a.getDouble(i); double y = $b.getDouble(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |if (!$isNull) $result = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
     """.stripMargin

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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
  }
}
