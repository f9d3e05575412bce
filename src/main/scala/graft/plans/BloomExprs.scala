package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom membership probe over a BROADCAST filter. The previous
  * formulation was a ScalaUDF — it boxed every url_hash Long and re-entered
  * the interpreter per row on the scheduling round's hottest filter; this
  * compiles to one call inside whole-stage codegen. The broadcast handle
  * serializes with the expression (standard TorrentBroadcast); each task
  * reads its executor-local value. */
case class BloomMightContainExpr(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(h: Any): Any =
    bloom.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom, "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, h =>
      s"((org.apache.spark.util.sketch.BloomFilter)$ref.value()).mightContainLong($h)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {
  def mightContain(hash: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftColumnBridge.column(
      BloomMightContainExpr(GraftColumnBridge.expression(hash), bloom))
}
