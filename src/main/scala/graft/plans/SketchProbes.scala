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

  /** EXECUTOR-GLOBAL deserialization cache keyed by (broadcast id, bucket):
    * expression instances ride the task binary and are deserialized fresh
    * per task, so an instance-level cache would re-deserialize every bucket
    * once per task (and once more for each filter branch of the gate). The
    * static map is shared by every task and both branches — genuinely one
    * deserialization per bucket per executor. Bounded crudely: cleared
    * whole when it outgrows the cap (the broadcast regime itself is bounded
    * by the partitioned-scale threshold, so entries are small and few; the
    * clear only costs re-deserialization). */
  private val CacheCap = 1 << 16
  private[plans] val probeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), LongPredicate]()
  private[plans] def cachedProbe(
      key: (Long, Int), load: () => LongPredicate): LongPredicate = {
    var fn = probeCache.get(key)
    if (fn == null) {
      if (probeCache.size() > CacheCap) probeCache.clear()
      fn = load()
      probeCache.put(key, fn)
    }
    fn
  }

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

  /** Per-instance (= per-task) hot path: an array lookup per row, zero
    * boxing. Loads go through the executor-global [[SketchProbes.probeCache]]
    * so the actual deserialization runs once per (broadcast, bucket) per
    * executor, not per task. Single-threaded by construction (one expression
    * instance per deserialized task binary). */
  @transient private lazy val local = new Array[LongPredicate](buckets)

  /** Called from generated code. */
  def probe(h: Long): Boolean = {
    val m = (h % buckets).toInt
    val bucket = if (m < 0) m + buckets else m // pmod semantics
    var fn = local(bucket)
    if (fn == null) {
      fn = SketchProbes.cachedProbe((sketches.id, bucket),
        () => sketches.value.get(bucket).map(deserialize).getOrElse(SketchProbes.Never))
      local(bucket) = fn
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
