package graft.seen

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Executor-side Bloom construction as a Catalyst aggregate: each group
  * (bucket) folds its long inputs into a BloomFilter whose partials are
  * merged where the data lives — the driver never assembles a monolithic
  * filter (the `stat.bloomFilter` path merges every partition sketch on the
  * driver, ~9 GiB at the 10^10-URL design scale; this aggregate keeps every
  * buffer proportional to its bucket).
  *
  * Usage: `seen.groupBy(bucket).agg(BloomAgg.bloomAgg(col, perBucket, fpp))`
  * -> one serialized filter (BinaryType) per bucket. Run it on input already
  * hash-partitioned by the group key so a task only ever holds its own
  * buckets' filters.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(math.max(expectedItems, 1L), fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(storageFormat))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    GraftColumnBridge.column(
      BloomAgg(GraftColumnBridge.expression(c), expectedItems, fpp).toAggregateExpression())
}
