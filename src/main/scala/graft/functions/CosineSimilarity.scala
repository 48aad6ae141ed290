package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two `array<float>` embedding columns:
  * one pass accumulating dot product and both squared norms in doubles,
  * then `dot / (√na·√nb)`.
  *
  * Numerically identical to the composed higher-order-function form
  * `aggregate(zip_with(a,b,(x,y)->x*y),0d,+) / (sqrt(Σx²)·sqrt(Σy²))`
  * for equal-length inputs: same sequential fold order, same
  * float→double widening per element (asserted by SimilarityOpsSpec),
  * so swapping it into an oracle-checked query cannot change results.
  *
  * Why native: HOF lambdas are CodegenFallback (interpreted per
  * element); in an all-pairs or top-k scoring loop over millions of
  * pairs × 64 dims that interpretation dominates the stage. `doGenCode`
  * emits a branch-free primitive loop that whole-stage codegen inlines
  * into the join/scoring stage. Unequal lengths score the common prefix
  * (callers share one embedding dim; documented, deterministic).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // each side independently accepts array<float> or array<double> — the
  // element accessor is picked PER SIDE at codegen time, so the common
  // float/float scoring loop emits exactly the code it always did
  private def floatOrDouble(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def sideIsDouble(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (floatOrDouble(left.dataType) && floatOrDouble(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // a null ELEMENT nulls the result (matching the HOF composition, where
  // a null product poisons the fold) — so the expression is nullable
  // even over non-null array columns when elements may be null
  override def nullable: Boolean = super.nullable || elementsNullable

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  // types are fixed after analysis — resolve once, not per row
  private lazy val leftIsDouble = sideIsDouble(left.dataType)
  private lazy val rightIsDouble = sideIsDouble(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lDouble = leftIsDouble
    val rDouble = rightIsDouble
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // element null-checks only emitted when the schema allows nulls —
      // the common non-null embedding case keeps the branch-free loop
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      val xAcc = if (sideIsDouble(left.dataType)) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      val yAcc = if (sideIsDouble(right.dataType)) s"$b.getDouble($i)"
        else s"(double) $b.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $xv = $xAcc;
         |  double $yv = $yAcc;
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
