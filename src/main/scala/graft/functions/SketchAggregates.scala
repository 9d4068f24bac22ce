package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signature-sketch aggregates for the dedup operators.
  *
  * Why native TypedImperativeAggregates instead of N parallel codegen'd
  * aggregates (round-1 design): 64 MIN/SUM aggregate expressions per
  * GROUP BY compile into a very large whole-stage-codegen class, and the
  * one-shot Janino compilation dominated the cold bench (minhash 5.9s
  * cold vs 1.95s steady; simhash worse). A typed imperative aggregate
  * keeps ONE object buffer per group and a tight JVM loop per row —
  * Catalyst plans it as ObjectHashAggregate with map-side partial
  * aggregation, so the distributed shape (partial → shuffle by key →
  * final) is unchanged at 100 TB while the driver-side codegen cost
  * disappears.
  *
  * Both aggregates consume an 8-byte hash column (xxhash64 upstream,
  * codegen'd) — never raw strings — so the per-row work is pure ALU.
  * Salted hash family: splitmix64 finalizer over (h, salt), the same
  * deterministic construction as [[LshHash.weight]]; no RNG state,
  * identical results on any cluster size / partition count.
  */
object SketchHash {
  /** i-th hash-family member applied to an already-hashed 8-byte value. */
  def mix(h: Long, salt: Int): Long = {
    var z = h + (salt + 1) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** mix64(h): the salt-0 member of the splitmix64 family as a scalar —
  * a deterministic pseudo-random total order over ids (the kmeans++-
  * style seeding uses it to pick a data-independent first seed without
  * any RNG state to ship). Same finalizer the sketch aggregates and LSH
  * hyperplanes already replay in DuckDB via HUGEINT arithmetic mod 2⁶⁴.
  */
case class Mix64(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 expects bigint, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mix64"

  override def nullSafeEval(input: Any): Any =
    SketchHash.mix(input.asInstanceOf[Long], 0)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchHash.mix($c, 0)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** minhash_sig(hs): array<long> of 64 per-family minima over the group's
  * 8-byte shingle hashes. Bands/buckets are derived downstream.
  */
case class MinHashSigAgg(
    child: Expression,
    nHashes: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a bigint hash column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < nHashes) {
        val hi = SketchHash.mix(h, i)
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

/** simhash_sig(h): 64-bit SimHash of the group's token hashes — bit i of
  * the result is set iff a majority of tokens have bit i set. Buffer =
  * 64 bit-counters + the row count, packed at eval time.
  */
case class SimHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val NBits = 64

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects a bigint hash column, got ${child.dataType.simpleString}")

  // counts(0..63) = per-bit ones; counts(64) = total rows
  override def createAggregationBuffer(): Array[Long] = new Array[Long](NBits + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < NBits) {
        buf(i) += (h >>> i) & 1L
        i += 1
      }
      buf(NBits) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= NBits) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(NBits)
    var sig = 0L
    var i = 0
    while (i < NBits) {
      if (2L * buf(i) > n) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (NBits + 1))
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NBits + 1)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSigAgg =
    copy(child = newChildren.head)
}
