package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native vector kernels for the embedding similarity path. The Column
  * formulation (`aggregate(zip_with(a, b, _*_), 0, _+_)`) allocates a zipped
  * array and runs two interpreted lambda passes per row-pair; these do one
  * fused loop over the unsafe array data inside whole-stage codegen. Both
  * operate on the integer-quantized vectors (array<long>) the cross-engine
  * oracles use — bit-identical results, just faster. */
object VecHelper {
  /** Σ a_i * b_i over the common prefix. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Σ (a_i - b_i)² over the common prefix. */
  def l2sq(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
    s
  }
}

case class LongVecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecHelper.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecHelper.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongVecDotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class LongVecL2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecHelper.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecHelper.l2sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongVecL2Expr =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq"
}

object VecExprs {
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LongVecDotExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      LongVecL2Expr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
