package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.url.UrlCanon

/** Codegen helper: static entry points callable from generated Java. */
object UrlCanonHelper {
  def eval(url: UTF8String): InternalRow = {
    val p = UrlCanon.canonParts(url.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(p.url_norm), UTF8String.fromString(p.host), p.depth))
  }
  def evalNorm(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.canonicalize(url.toString))
}

/** Native Catalyst expression for the RFC-3986 canonicalizer: one parse per
  * URL producing (url_norm, host, depth), generated code calling a static
  * helper — no ScalaUDF converter allocation per row, stays inside
  * whole-stage codegen. Bench showed the ScalaUDF wrapper cost 10-40x the
  * actual canonicalization (SURVEY.md §7 "promote to Expression when bench
  * justifies" — it did). */
case class UrlCanonPartsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = UrlCanonPartsExpr.schema
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UrlCanonHelper.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UrlCanonHelper.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonPartsExpr =
    copy(child = newChild)

  override def prettyName: String = "url_canon_parts"
}

object UrlCanonPartsExpr {
  val schema: StructType = StructType(Seq(
    StructField("url_norm", StringType),
    StructField("host", StringType),
    StructField("depth", IntegerType)))

  /** Column API: canonParts(col) -> struct(url_norm, host, depth). */
  def canonParts(c: Column): Column =
    GraftColumnBridge.column(UrlCanonPartsExpr(GraftColumnBridge.expression(c)))
}

/** String-only variant: canonical URL. */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UrlCanonHelper.evalNorm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UrlCanonHelper.evalNorm($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
  override def prettyName: String = "url_canon"
}

object UrlCanonExpr {
  def canon(c: Column): Column =
    GraftColumnBridge.column(UrlCanonExpr(GraftColumnBridge.expression(c)))
}
