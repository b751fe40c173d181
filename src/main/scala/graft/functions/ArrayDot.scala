package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer dot product over two `array<bigint>` columns — the
  * inner loop of the ANN family (q38/q39/q44 scoring, hyperplane bucket
  * signs, norm² computation).
  *
  * Why a custom Catalyst expression and not
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)`: the higher-order-function
  * chain materializes an intermediate 64-element array per row pair and
  * evaluates its lambdas interpreted (HigherOrderFunction is
  * CodegenFallback), breaking the surrounding whole-stage-codegen span at
  * exactly the hottest operator. This expression compiles to a primitive
  * `long` accumulation loop over the two unsafe array buffers — no
  * allocation, no virtual calls — and keeps the span fused. Semantics are
  * identical on the quantized-int embeddings (exact int64 arithmetic, so
  * results stay bit-identical across engines and the DuckDB oracles are
  * unchanged).
  *
  * Contract — exactly the `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * semantics, so the swap can never change a result: NULL input array →
  * NULL; mismatched lengths → NULL (zip_with null-pads the shorter side,
  * which null-poisons the aggregate); any NULL element → NULL. The
  * engine's quantized embeddings are fixed-dim with non-null elements, so
  * the hot path never takes the NULL branches — but the function is also
  * registered for arbitrary SQL text, where they must hold.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column wrapper: exact int64 dot product of two array<bigint> columns.
    * Session-independent (no registry needed); SQL-text users get the same
    * expression as `long_array_dot(a, b)` via [[graft.GraftExtensions]].
    */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
