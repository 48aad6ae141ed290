package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Robust-winnowing fingerprint SELECTION (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03
  * §4) over a window-hash sequence — the classic guarantee-bearing way
  * to thin [[RollingWindowHashes]]'s every-offset hashes down to a
  * fingerprint set: in each window of `w` consecutive hashes select the
  * minimum, breaking ties by the RIGHTMOST occurrence. (The paper's
  * full "robust" rule prefers RE-SELECTING the previous window's hash on
  * a tie and only falls back to rightmost; this implementation uses
  * rightmost-always — position-deterministic and stateless, so the
  * Scala expression, the DuckDB oracle, and the brute-force spec agree
  * without sequential tie-state. Same t = w + k − 1 detection guarantee
  * and ~2/(w+1) expected density; only which-of-equal-hashes is kept
  * can differ from a by-the-letter robust implementation, and equal
  * hashes fingerprint the same content anyway.) Any shared substring of
  * at least
  * `w + k − 1` tokens is guaranteed to share a selected fingerprint,
  * and selection density is ~2/(w+1) — the local-algorithm property
  * that makes fingerprint indexes O(corpus/w) instead of O(corpus).
  *
  * Returns `array<struct<j:int, fp:bigint>>` — the selected positions
  * (0-based offsets into the hash sequence) with their hashes, strictly
  * increasing in `j`. A window count of `max(1, m−w+1)` makes the
  * operator total: a doc with 0 < m < w hashes yields the minimum of
  * its single short window; an empty hash sequence yields an empty
  * array.
  *
  * O(m) via the monotonic-deque sliding minimum (pop `≥` on push, so
  * the survivor among equal values is the rightmost); consecutive
  * windows re-selecting the same position collapse to one entry —
  * selection position is non-decreasing across windows, so that
  * dedup is a one-token comparison, not a set. Codegen'd via a static
  * helper like the other expressions in this package.
  */
case class WinnowedFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> argument, got $t")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("j", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnowed_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowedFingerprints.winnow(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowedFingerprints.winnow($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}

object WinnowedFingerprints {

  /** Shared by interpreted eval and generated code. */
  def winnow(whs: ArrayData, w: Int): ArrayData = {
    val m = whs.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val vals = new Array[Long](m)
    var i = 0
    while (i < m) { vals(i) = whs.getLong(i); i += 1 }
    val out = new java.util.ArrayList[InternalRow]()
    // monotonic deque of indices; values strictly increasing front→back.
    // Popping `>=` on push keeps the RIGHTMOST index among equal values,
    // which makes deque.front the robust-winnowing selection.
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var lastSelected = -1
    i = 0
    while (i < m) {
      while (tail > head && vals(deque(tail - 1)) >= vals(i)) tail -= 1
      deque(tail) = i; tail += 1
      val windowStart = i - w + 1 // first full window ends at i = w-1
      while (deque(head) < windowStart) head += 1
      // emit once per window: windows are [j, j+w-1] for j in 0..m-w,
      // or the single short window [0, m-1] when m < w
      if (i >= w - 1 || i == m - 1) {
        val sel = deque(head)
        if (sel != lastSelected) {
          out.add(new GenericInternalRow(Array[Any](sel, vals(sel))))
          lastSelected = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size())))
  }

  def apply(c: Column, w: Int): Column =
    GraftColumnBridge.column(
      WinnowedFingerprints(GraftColumnBridge.expression(c), w))
}
