package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Unboxed membership predicate over a 64-bit key — the deserialized form of
  * one bucket's sketch (cuckoo/Bloom binary). A dedicated trait instead of
  * `Long => Boolean` so the generated code calls `test(long)` without
  * boxing. */
trait LongPredicate extends Serializable { def test(h: Long): Boolean }

object SketchProbes {
  /** The definitely-absent probe for buckets with no sketch row. */
  object Never extends LongPredicate { override def test(h: Long): Boolean = false }

  /** Cuckoo-sketch membership of `hash` against a broadcast per-bucket
    * filter map (bucket = pmod(hash, buckets)) — codegen'd, one
    * deserialization per bucket per EXECUTOR (lazy, cached), zero joins and
    * zero exchanges on the probed side. The broadcast-map regime mirrors the
    * broadcast Bloom build: total sketch bytes are driver/executor-friendly
    * below the partitioned threshold; past it the per-bucket cogroup gate
    * keeps the executor memory bound at seen/buckets. */
  def cuckooAny(
      hash: Column,
      sketches: Broadcast[Map[Int, Array[Byte]]],
      buckets: Int): Column =
    GraftColumnBridge.column(SketchAnyProbeExpr(
      GraftColumnBridge.expression(hash), sketches, buckets,
      SketchProbes.cuckooDeserialize))

  /** Static deserializer (no outer capture — serializes as a tiny lambda). */
  val cuckooDeserialize: Array[Byte] => LongPredicate = bytes => {
    val f = graft.seen.CuckooFilter.deserialize(bytes)
    new LongPredicate { override def test(h: Long): Boolean = f.mightContain(h) }
  }
}

/** `probe(hash)` = does bucket pmod(hash, buckets)'s sketch claim `hash`?
  * A bucket absent from the map is definitely-new (constant false). The
  * per-bucket binaries deserialize lazily ONCE per executor (transient
  * concurrent cache keyed by bucket id — bounded by the broadcast map
  * itself, which is only used below the partitioned-scale threshold). */
case class SketchAnyProbeExpr(
    child: Expression,
    sketches: Broadcast[Map[Int, Array[Byte]]],
    buckets: Int,
    deserialize: Array[Byte] => LongPredicate)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sketch_any_probe expects a BIGINT hash child, got ${child.dataType.catalogString}")

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, LongPredicate]()

  /** Called from generated code — keep it public and allocation-free on the
    * hit path. */
  def probe(h: Long): Boolean = {
    val m = (h % buckets).toInt
    val bucket = if (m < 0) m + buckets else m // pmod semantics
    var fn = cache.get(bucket)
    if (fn == null) {
      fn = sketches.value.get(bucket).map(deserialize).getOrElse(SketchProbes.Never)
      cache.put(bucket, fn)
    }
    fn.test(h)
  }

  override protected def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sketchProbe", this, classOf[SketchAnyProbeExpr].getName)
    defineCodeGen(ctx, ev, h => s"$ref.probe($h)")
  }

  override protected def withNewChildInternal(c: Expression): SketchAnyProbeExpr =
    copy(child = c)
  override def prettyName: String = "sketch_any_probe"
}
