package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k as a Catalyst aggregate — the scale path for "k nearest
  * per group" that a `row_number` window cannot provide.
  *
  * A window `partitionBy(group)` moves every row of a group to ONE task
  * before ranking — for a brute-force ANN scan that is the whole corpus
  * per query on a single core. This aggregate instead keeps a bounded
  * heap of k rows per (partition, group) in the map-side PARTIAL pass, so
  * each of N partitions ships at most k rows per group to the merge —
  * communication drops from |corpus| to k·N, and no task ever holds more
  * than k rows per group. This is the same partial/final decomposition
  * Spark's own TakeOrderedAndProject uses for global LIMIT+ORDER, made
  * available per-group.
  *
  * `key` is compared ASCENDING lexicographically (struct ordering); wrap
  * descending fields with a negation. The result is the `payload` array
  * of the k smallest keys, in key order — deterministic whenever the key
  * is a total order.
  */
case class TopKAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k > 0, "top_k requires k > 0")

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, false)
  override def prettyName: String = "top_k"

  private lazy val keyType = key.dataType.asInstanceOf[StructType]
  private lazy val payType = payload.dataType.asInstanceOf[StructType]
  private lazy val keyOrdering =
    TypeUtils.getInterpretedOrdering(keyType)
  private lazy val rowProj =
    UnsafeProjection.create(Array[DataType](keyType, payType))

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k, keyType.length, keyOrdering)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val kv = key.eval(input)
    if (kv != null) {
      // one UnsafeRow holding (key struct, payload struct): a single
      // compact copy per retained row
      val row = rowProj(InternalRow(kv, payload.eval(input))).copy()
      buf.insert(row)
    }
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.rows.foreach(buf.insert)
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val sorted = buf.sorted
    new GenericArrayData(sorted.map(_.getStruct(1, payType.length)
      .copy().asInstanceOf[Any]))
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.rows.size)
    buf.rows.foreach { r =>
      val u = r.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(2)
      row.pointTo(rowBytes, len)
      buf.insert(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(key = newChildren(0), payload = newChildren(1))
}

object TopKAgg {

  /** Bounded max-heap on the key struct (field 0 of each row): keeps the
    * k smallest rows seen; O(log k) insert, O(k) memory. */
  final class Buffer(k: Int, keyFields: Int, ord: Ordering[Any]) {
    private val heapOrd = new Ordering[InternalRow] {
      // max-heap over the KEY struct so the largest retained key is on top
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(a.getStruct(0, keyFields), b.getStruct(0, keyFields))
    }
    private val heap =
      new scala.collection.mutable.PriorityQueue[InternalRow]()(heapOrd)

    def insert(row: InternalRow): Unit =
      if (heap.size < k) heap.enqueue(row)
      else if (heapOrd.compare(row, heap.head) < 0) {
        heap.dequeue(); heap.enqueue(row)
      }

    def rows: Iterable[InternalRow] = heap
    def sorted: Array[InternalRow] = heap.toArray.sorted(heapOrd)
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** `top_k(key, payload, k)` as a Column aggregate: the payloads of the
    * k smallest keys, ascending. Negate a field in `key` for descending
    * order. */
  def topK(key: Column, payload: Column, k: Int): Column =
    column(TopKAgg(expression(key), expression(payload), k)
      .toAggregateExpression())
}
