package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two dimension keys — the multi-column
  * data-layout primitive: sorting a table by `z_value(x, y)` clusters
  * rows so that BOTH dimensions are locally narrow within every file or
  * row group, and a parquet reader's min/max stats can then prune scans
  * filtered on either column (or both). A plain `ORDER BY x, y` layout
  * prunes only on `x` — the trailing dimension's min/max spans the whole
  * domain in every file. This is the standard warehouse trick for "two
  * filter columns, one physical sort order" at 100 TB.
  *
  * Encoding: the low 16 bits of each input (callers bound their keys —
  * `& 4095`-style — so truncation is explicit upstream) interleave into
  * a 32-bit Morton code: bit j of `x` lands at bit 2j, bit j of `y` at
  * bit 2j+1. The spread uses the classic shift-or-mask ladder (4 steps),
  * branch-free in one codegen'd static call.
  */
object ZValueKernel {
  /** Spread the low 16 bits of v so bit j lands at bit 2j. */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
  def compute(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** `z_value(x, y)` — 32-bit Morton code over the low 16 bits of two
  * long dimension keys; see [[ZValueKernel]].
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_value expects two bigint args, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZValueKernel.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZValueKernel.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValueFunctions {
  /** Codegen'd Morton interleave of two long keys (low 16 bits each). */
  def zValue(x: Column, y: Column): Column =
    Bridge.column(ZValue(Bridge.expression(x), Bridge.expression(y)))
}
