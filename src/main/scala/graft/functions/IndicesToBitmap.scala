package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Builds a fixed-width `array<bigint>` bitmap from an `array<int>` of
  * set-element indices: bit (i mod 64) of word (i div 64) is set for
  * every index i. Out-of-range indices (< 0 or ≥ 64·width) are ignored
  * rather than failing — the caller sizes `width` from the vocabulary.
  *
  * Runs once per document (not per pair), so interpreted eval is fine —
  * CodegenFallback keeps the implementation minimal; the per-pair hot
  * loop is the codegen'd [[BitmapIntersectCount]].
  */
case class IndicesToBitmap(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int) arguments, got $l / $r")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "indices_to_bitmap"

  override protected def nullSafeEval(idxs: Any, w: Any): Any = {
    val xs = idxs.asInstanceOf[ArrayData]
    val width = w.asInstanceOf[Int]
    val words = new Array[Long](width)
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val idx = xs.getInt(i)
        // long bound: width * 64 overflows Int for width > 2^25
        if (idx >= 0 && idx.toLong < width.toLong * 64) {
          words(idx >>> 6) |= 1L << (idx & 63)
        }
      }
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IndicesToBitmap =
    copy(left = newLeft, right = newRight)
}

object IndicesToBitmap {
  def apply(idxs: Column, width: Column): Column =
    GraftColumnBridge.column(IndicesToBitmap(
      GraftColumnBridge.expression(idxs), GraftColumnBridge.expression(width)))
}
