package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `Σᵢ popcount(aᵢ & bᵢ)` over two equal-width `array<bigint>` bitmap
  * columns — the set-intersection cardinality when the arrays encode
  * sets as fixed-width bitmaps (bit k of word w ⇔ element 64·w+k).
  *
  * A native Catalyst expression (not a UDF, not a higher-order
  * function): Spark's HOFs (`zip_with`/`aggregate`) are CodegenFallback
  * — every lambda step is interpreted, which is 10-50× slower in the
  * pair-scoring loop of an all-pairs similarity join where this runs
  * millions of times. `doGenCode` emits a tight primitive loop with no
  * allocation, which whole-stage codegen inlines into the join stage.
  *
  * Width mismatch is a caller bug (bitmaps must share one vocabulary);
  * the shorter width is used, matching zip_with-with-null semantics of
  * dropping the tail (documented, deterministic).
  */
case class BitmapIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (hence ExpectsInputTypes) is private[sql] — check
  // input types explicitly instead. Nullable ELEMENTS are rejected at
  // analysis time: a bitmap with a missing word has no well-defined
  // intersection, and a runtime per-element null branch measurably
  // de-optimizes the 10⁷-pair join loop this expression exists for
  // (4-5× on the jaccard bench). Bitmaps come from indices_to_bitmap,
  // whose output type is array<bigint> containsNull=false, so real
  // pipelines always pass; hand-built nullable arrays get a clear
  // analysis error instead of a silent undercount.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires non-null array elements " +
            "(build bitmaps with indices_to_bitmap)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got $l / $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapIntersectCount =
    copy(left = newLeft, right = newRight)
}

object BitmapIntersectCount {
  /** Column-API entry point — usable on any session, no registry needed. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(BitmapIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
