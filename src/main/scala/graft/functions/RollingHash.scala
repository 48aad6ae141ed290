package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin-Karp) rolling fingerprint of a string column:
  * `h = Σ bytes: (h·base + byte) mod m` — the classic rolling hash whose
  * incremental window-update property powers content-defined chunking
  * and streaming fingerprints; here the whole-string form is the cheap
  * engine-portable document fingerprint (md5 costs ~10× more per byte).
  *
  * Byte-level over UTF-8: callers should normalize to ASCII (the query
  * layer strips to [a-z0-9 ]) when an oracle compares per-codepoint.
  * Native codegen'd loop — runs inside the scan's codegen stage.
  */
case class RollingHash(child: Expression, base: Int, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes(), $base, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Shared by interpreted eval and generated code. */
  def hashBytes(bytes: Array[Byte], base: Int, mod: Long): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  def apply(c: Column, base: Int = 31, mod: Long = 1000000007L): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c), base, mod))
}
