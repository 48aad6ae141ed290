package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rabin window hashes of EVERY k-token window of a token array —
  * the overlapping-substring signal of exact-substring dedup (Lee et
  * al. ACL'22) at any offset, where fixed non-overlapping passages
  * ([[graft.operators.DedupOps.passageDedup]]) only see block-aligned
  * repeats. Each token is first collapsed to its [[RollingHash]] char
  * fold (base 31), then windows fold token values with the outer
  * `base` — and the O(n) ROLLING update `h' = (h − v₀·baseᵏ⁻¹)·base +
  * vₖ (mod m)` replaces the O(n·k) per-window recompute, which is the
  * whole point of a rolling hash: at 100 TB the window pass costs the
  * same as a single fingerprint pass. Inverse-free (subtract-head,
  * multiply, add-tail), so any modulus works; operands stay under
  * 2⁶³ (v·pow < m² ≈ 10¹⁸). Returns an empty array when the doc is
  * shorter than k tokens. Codegen'd via a static helper like its
  * whole-string sibling.
  */
case class RollingWindowHashes(child: Expression, k: Int, base: Int, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    RollingWindowHashes.hashWindows(input.asInstanceOf[ArrayData], k, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingWindowHashes.hashWindows($c, $k, $base, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}

object RollingWindowHashes {

  /** Shared by interpreted eval and generated code. */
  def hashWindows(arr: ArrayData, k: Int, base: Int, mod: Long): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      vals(i) = RollingHash.hashBytes(arr.getUTF8String(i).getBytes, 31, mod)
      i += 1
    }
    var pow = 1L // base^(k-1) mod m — the head-removal multiplier
    var e = 0
    while (e < k - 1) { pow = (pow * base) % mod; e += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * base + vals(i)) % mod; i += 1 }
    out(0) = h
    var j = 1
    while (j <= n - k) {
      h = ((h - (vals(j - 1) * pow) % mod) % mod + mod) % mod
      h = (h * base + vals(j + k - 1)) % mod
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, k: Int, base: Int = 1000003,
      mod: Long = 1000000007L): Column =
    GraftColumnBridge.column(
      RollingWindowHashes(GraftColumnBridge.expression(c), k, base, mod))
}
