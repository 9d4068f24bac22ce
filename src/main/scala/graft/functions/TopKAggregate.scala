package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: at most k (ord, id) pairs in a binary MIN-heap
  * keyed by "weakness" (smallest ord — ties broken by LARGEST id — at the
  * root, i.e. the next eviction candidate). Per-row update is O(log k)
  * and usually O(1) (a row weaker than the root is rejected with one
  * compare), vs the O(k) array shift of the round-2 version — which made
  * large-k aggregations quadratic per group (ADVICE r2). Arrays grow
  * lazily (16 → 2× up to k), so a k = 1M aggregate over small groups
  * doesn't pre-allocate 16 MB per group buffer. Final (ord DESC, id ASC)
  * ordering is produced once per group in eval.
  *
  * Ordinal comparisons use java.lang.Double.compare — the same total
  * order Spark's SortExec applies to doubles (NaN greatest, −0.0 < 0.0)
  * — so topk_by agrees with the window row_number formulation it
  * replaces even on NaN/±0.0 inputs; raw `>`/`==` would silently drop
  * NaN rows and corrupt the heap invariant.
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  var ords: Array[Double] = new Array[Double](math.min(k, 16))
  var ids: Array[Long] = new Array[Long](math.min(k, 16))

  /** entry a strictly weaker than entry b (a evicts before b)? */
  @inline private def weaker(oa: Double, ia: Long, ob: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(oa, ob)
    c < 0 || (c == 0 && ia > ib)
  }

  private def grow(): Unit = {
    val cap = math.min(k, math.max(16, ords.length * 2))
    ords = java.util.Arrays.copyOf(ords, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  @inline private def siftUp(from: Int): Unit = {
    var c = from
    val o = ords(c); val i = ids(c)
    while (c > 0 && weaker(o, i, ords((c - 1) >> 1), ids((c - 1) >> 1))) {
      val p = (c - 1) >> 1
      ords(c) = ords(p); ids(c) = ids(p)
      c = p
    }
    ords(c) = o; ids(c) = i
  }

  @inline private def siftDown(from: Int): Unit = {
    var p = from
    val o = ords(p); val i = ids(p)
    var done = false
    while (!done) {
      var c = 2 * p + 1
      if (c >= n) done = true
      else {
        if (c + 1 < n && weaker(ords(c + 1), ids(c + 1), ords(c), ids(c))) c += 1
        if (weaker(ords(c), ids(c), o, i)) {
          ords(p) = ords(c); ids(p) = ids(c)
          p = c
        } else done = true
      }
    }
    ords(p) = o; ids(p) = i
  }

  def insert(o: Double, i: Long): Unit = {
    if (n < k) {
      if (n == ords.length) grow()
      ords(n) = o; ids(n) = i
      n += 1
      siftUp(n - 1)
    } else if (weaker(ords(0), ids(0), o, i)) {
      ords(0) = o; ids(0) = i
      siftDown(0)
    }
  }

  /** Entry indices in output order: (ord DESC, id ASC). */
  def sortedIndices(): Array[Integer] = {
    val idx = Array.tabulate[Integer](n)(j => j)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(ords(b), ords(a))
      if (c != 0) c else java.lang.Long.compare(ids(a), ids(b))
    })
    idx
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
    else kExpr.eval() match {
      // a NULL literal unboxes to 0 and used to report the misleading
      // "k out of range: 0" (ADVICE r2)
      case null =>
        TypeCheckResult.TypeCheckFailure("topk_by k must be a non-null literal int")
      case kv: Int if kv >= 1 && kv <= (1 << 20) => TypeCheckResult.TypeCheckSuccess
      case kv => TypeCheckResult.TypeCheckFailure(s"topk_by k out of range: $kv")
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
    val idx = buf.sortedIndices()
    val rows = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      val p = idx(j)
      rows(j) = new GenericInternalRow(Array[Any](buf.ords(p), buf.ids(p)))
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
    // rebuild through insert: n <= k so nothing is rejected, the heap
    // invariant is restored, and the lazily-sized arrays grow as needed
    var j = 0
    while (j < n) {
      val o = bb.getDouble(); val i = bb.getLong()
      buf.insert(o, i)
      j += 1
    }
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
