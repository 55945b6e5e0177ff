package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded uniform reservoir as an aggregate: keeps the (key, value) pairs
  * whose KEY is among the k smallest distinct keys seen, ascending by key.
  * With a uniform hash key (the engine's md5-52-bit id key), the retained
  * VALUES are a uniform k-row sample of the population — [[KMinValues]]
  * carrying a payload, which is what turns the k-min-hash sample from a
  * two-pass batch construction (threshold, then re-scan) into a ONE-PASS
  * mergeable sketch: map-side combinable, shard-mergeable by the same
  * k-min order statistic, and therefore runnable verbatim as a streaming
  * COMPLETE-mode aggregation with state bounded by groups×k (the q136
  * mergeable-sketch lesson applied to sampling).
  *
  * Duplicate keys keep the SMALLEST value (order-independent, so re-read
  * input files and shard merges are deterministic; with 52-bit hashes of
  * distinct ids, duplicate keys are re-deliveries of the same row and the
  * rule never fires on different values in practice).
  */
case class KMinPairs(
    left: Expression,  // key (long) — uniform hash for sampling semantics
    right: Expression, // carried value (long)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmin_pairs expects (LONG key, LONG value) and k >= 1, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}), k=$k")

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def insert(
      b: java.util.TreeMap[java.lang.Long, java.lang.Long],
      key: Long, value: Long): Unit = {
    if (b.size() < k || key < b.lastKey()) {
      val prev = b.get(key)
      if (prev == null) {
        b.put(key, value)
        if (b.size() > k) b.pollLastEntry()
      } else if (value < prev.longValue()) b.put(key, value)
    } else if (key == b.lastKey().longValue()) {
      val prev = b.get(key)
      if (value < prev.longValue()) b.put(key, value)
    }
  }

  override def update(
      b: java.util.TreeMap[java.lang.Long, java.lang.Long],
      row: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val kv = left.eval(row)
    val vv = right.eval(row)
    if (kv != null && vv != null)
      insert(b, kv.asInstanceOf[Long], vv.asInstanceOf[Long])
    b
  }

  override def merge(
      b: java.util.TreeMap[java.lang.Long, java.lang.Long],
      o: java.util.TreeMap[java.lang.Long, java.lang.Long]):
      java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = o.entrySet().iterator()
    var continue = true
    while (it.hasNext && continue) {
      val e = it.next()
      // o is ascending: once a key can neither enter nor improve a
      // duplicate, no later key can either
      if (b.size() >= k && e.getKey.longValue() > b.lastKey().longValue())
        continue = false
      else insert(b, e.getKey.longValue(), e.getValue.longValue())
    }
    b
  }

  override def eval(
      b: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Any](b.size())
    val it = b.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(
      b: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size())
    bb.putInt(b.size())
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.put(bb.getLong(), bb.getLong()); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_pairs"

  override def withNewMutableAggBufferOffset(offset: Int): KMinPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KMinPairs =
    copy(left = newLeft, right = newRight)
}
