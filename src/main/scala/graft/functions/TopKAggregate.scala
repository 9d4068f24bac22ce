package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: (ord, id) pairs kept sorted by (ord DESC, id ASC),
  * never more than k entries. Insertion is a short shift (k is small);
  * merge is a k-way sorted merge.
  *
  * Ordinal comparisons use java.lang.Double.compare — the same total
  * order Spark's SortExec applies to doubles (NaN greatest, −0.0 < 0.0)
  * — so topk_by agrees with the window row_number formulation it
  * replaces even on NaN/±0.0 inputs; raw `>`/`==` would silently drop
  * NaN rows and corrupt the sorted-buffer invariant.
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val ords: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  @inline private def beats(o: Double, i: Long, pos: Int): Boolean = {
    val c = java.lang.Double.compare(o, ords(pos))
    c > 0 || (c == 0 && i < ids(pos))
  }

  def insert(o: Double, i: Long): Unit = {
    if (n == k && !beats(o, i, n - 1)) return
    var p = if (n < k) n else n - 1
    while (p > 0 && beats(o, i, p - 1)) {
      ords(p) = ords(p - 1); ids(p) = ids(p - 1); p -= 1
    }
    ords(p) = o; ids(p) = i
    if (n < k) n += 1
  }
}

/** topk_by(ord, id, k): aggregate returning the k largest (ord, id) pairs
  * per group as array<struct<ord: double, id: bigint>>, ordered by
  * (ord DESC, id ASC) with ties broken on id.
  *
  * Why native: Spark's idiomatic per-key top-k is a window row_number +
  * filter, which sorts EVERY row of every key after a full shuffle. This
  * aggregate prunes map-side — each partition ships at most k entries per
  * key into the exchange, and no sort ever materializes — the per-key
  * analogue of what TakeOrderedAndProjectExec does for global ORDER BY +
  * LIMIT. On 100 TB the shuffle shrinks from |rows| to ≤ k·|keys|·
  * |partitions|. The reference engine has no top-k operator at all
  * (ORDER BY + LIMIT stack, /root/reference/src/exec/operator.cpp:
  * 1076-1161); this is the scale-native generalization.
  */
case class TopKByAgg(
    ord: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(ord, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_by"

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by ordinal must be double, got ${ord.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by id must be bigint, got ${id.dataType.simpleString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_by k must be a literal int")
    else {
      val kv = kExpr.eval().asInstanceOf[Int]
      if (kv >= 1 && kv <= (1 << 20)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"topk_by k out of range: $kv")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      buf.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < other.n) {
      buf.insert(other.ords(j), other.ids(j))
      j += 1
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      rows(j) = new GenericInternalRow(Array[Any](buf.ords(j), buf.ids(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putDouble(buf.ords(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) {
      val o = bb.getDouble(); val i = bb.getLong()
      buf.ords(j) = o; buf.ids(j) = i; j += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(ord = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
