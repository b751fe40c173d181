package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd position-weighted rolling checksum over a string's code
  * points: `Σ codepoint(c_i) × i` (1-based character positions) — the
  * document-fingerprint core of q34.
  *
  * Why a custom expression and not `aggregate(zip_with(split(text, ''),
  * sequence(1, length(text)), ...))`: that chain materializes TWO O(len)
  * arrays per row (the per-character split and the index sequence) and
  * evaluates its lambdas interpreted — HigherOrderFunction is
  * CodegenFallback, breaking the whole-stage-codegen span around the
  * scan. Exactly the pattern [[LongArrayDot]] exists to avoid on the ANN
  * path; this closes the same hole on the text path. Here it compiles to
  * one static call over the UTF8String's byte buffer — no allocation,
  * span stays fused.
  *
  * Semantics match the HOF formulation and the DuckDB oracle
  * (`ascii(substring(text, i, 1)) * i`): positions count CHARACTERS
  * (code points), not bytes, and each character contributes its Unicode
  * code point. The raw weighted sum is returned (callers apply their own
  * modulus); it fits a long for any document under ~60 GB of 'z's.
  */
case class StringRollHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "string_roll_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollHash.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helper shared by interpreted eval and generated code (a plain
  * object with a static forwarder, so Janino resolves
  * `graft.functions.RollHash.compute`).
  */
object RollHash {
  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    var i = 0
    var pos = 1L
    var acc = 0L
    while (i < n) {
      val b = s.getByte(i)
      var cp = 0
      var len = 1
      if ((b & 0x80) == 0) { cp = b }
      else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
      else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
      else { cp = b & 0x07; len = 4 }
      var j = 1
      while (j < len) { cp = (cp << 6) | (s.getByte(i + j) & 0x3F); j += 1 }
      acc += cp.toLong * pos
      pos += 1
      i += len
    }
    acc
  }

  /** Column wrapper, session-independent (no registry needed). */
  def rollHash(c: Column): Column =
    ColumnBridge.column(StringRollHash(ColumnBridge.expression(c)))
}
