package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Content-defined-chunking boundary scan, done natively.
  *
  * The original [[graft.ext.Multimodal.mediaCdcDedupOn]] boundary pass
  * phrased the rolling-window test in SQL over a hex dump of the
  * payload: 8 `substring`+`strpos` string ops PER BYTE, plus a
  * `transform(sequence(4, n-1), ...)` whose intermediate array
  * materializes one entry per byte before the boundary filter. That made
  * CDC the single slowest query in the whole bench (~16-20 s at sf0.1 vs
  * ~2.5 s for its fixed-size sibling). The byte loop belongs in one
  * tight JVM method: a single pass over the raw payload bytes, emitting
  * only the boundary positions.
  *
  * Semantics are bit-identical to the SQL it replaces (and therefore to
  * the DuckDB HUGEINT replay oracle): window value = bytes p−3..p as an
  * unsigned big-endian 32-bit integer, boundary AFTER byte p (1-based)
  * when `pmod(mix64(w), mask) = 0`, p ranging 4..n−1 so the final bound
  * stays unique; the returned array is the full fence-post list
  * `[0, interior…, n]` ready for chunk slicing.
  */
object CdcHashUtil {
  def bounds(payload: Array[Byte], mask: Int): ArrayData = {
    val n = payload.length
    val buf = new java.util.ArrayList[java.lang.Long]()
    buf.add(0L)
    var p = 4
    while (p <= n - 1) { // 1-based byte positions 4..n-1
      val w = ((payload(p - 4) & 0xffL) << 24) |
        ((payload(p - 3) & 0xffL) << 16) |
        ((payload(p - 2) & 0xffL) << 8) |
        (payload(p - 1) & 0xffL)
      val h = SketchHash.mix(w, 0)
      // pmod semantics, exact for any positive mask (the operator
      // restricts to powers of two so the oracle's unsigned low-bits
      // replay agrees, but the expression mirrors the SQL faithfully)
      if (((h % mask) + mask) % mask == 0) buf.add(p.toLong)
      p += 1
    }
    buf.add(n.toLong)
    val out = new Array[Long](buf.size)
    var i = 0
    while (i < out.length) { out(i) = buf.get(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** cdc_bounds(payload, mask): array<bigint> of content-defined chunk
  * fence posts `[0, boundaries…, length]` over a binary payload.
  */
case class CdcBounds(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds expects (binary, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_bounds"

  override def nullSafeEval(payload: Any, mask: Any): Any =
    CdcHashUtil.bounds(payload.asInstanceOf[Array[Byte]],
      mask.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, m) => s"graft.functions.CdcHashUtil.bounds($p, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CdcBounds =
    copy(left = newLeft, right = newRight)
}

/** byte_histogram(payload): the 256-bin byte-value histogram of a binary
  * column as array<bigint> — the codec-free content signature under
  * [[graft.ext.Multimodal]]'s histogram similarity: one tight pass over
  * the raw bytes per row, no per-byte explode (the token-stream lesson
  * applied to payloads — at 100 TB the bytes never leave the scan).
  */
object ByteHistUtil {
  def histogram(payload: Array[Byte]): ArrayData = {
    val h = new Array[Long](256)
    var i = 0
    while (i < payload.length) {
      h(payload(i) & 0xff) += 1L
      i += 1
    }
    new GenericArrayData(h)
  }
}

/** phash64(payload): 64-bit dHash of a binary payload over its 8×9
  * block-mean grid ([[graft.ext.Multimodal.mediaPhashDedupOn]]). Byte i
  * belongs to block `(i·72) div len` (exact integer arithmetic — the
  * DuckDB replay assigns blocks with the same `//` expression), block
  * value = truncated mean, and bit r·8+c is set when grid cell (r, c)
  * exceeds its right neighbor. One tight pass per row; phrased as SQL
  * HOFs (a 64-step transform/aggregate over a block-means array) the
  * same computation generated enough Janino input to dominate the whole
  * query's wall-clock at bench scale.
  */
object PHashUtil {
  def phash(payload: Array[Byte]): Long = {
    val len = payload.length
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var i = 0
    while (i < len) {
      val b = ((i.toLong * 72L) / len).toInt
      sums(b) += payload(i) & 0xff
      cnts(b) += 1L
      i += 1
    }
    val m = new Array[Long](72)
    var b = 0
    while (b < 72) {
      m(b) = if (cnts(b) == 0L) 0L else sums(b) / cnts(b)
      b += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      val cell = (k >> 3) * 9 + (k & 7)
      if (m(cell) > m(cell + 1)) h |= 1L << k
      k += 1
    }
    h
  }
}

case class PHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"phash64 expects binary, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phash64"

  override def nullSafeEval(payload: Any): Any =
    PHashUtil.phash(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.PHashUtil.phash($p)")

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

case class ByteHistogram(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_histogram expects binary, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(payload: Any): Any =
    ByteHistUtil.histogram(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.ByteHistUtil.histogram($p)")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

/** `pcm16_energy(payload, win)` — per-window exact energy of a binary
  * payload interpreted as little-endian SIGNED 16-bit PCM: sample j =
  * bytes (2j, 2j+1) as lo | (signed hi << 8); window w's energy is the
  * exact Σ s² (BIGINT — 2¹⁵² · win « 2⁶³ for any practical win) over
  * samples [w·win, (w+1)·win); a trailing partial window keeps its
  * partial sum, a trailing odd byte is ignored (not a sample). The
  * audio sibling of [[ByteHistogram]]: the whole frame-energy pass is
  * one tight scan-side loop in whole-stage codegen — the SQL form (hex
  * dump → per-byte strpos → per-sample CASE → regroup) materializes
  * rows per BYTE and is the exact shape that made the CDC boundary
  * scan the slowest query in the bench before [[CdcHashUtil]].
  */
object Pcm16Util {
  def energies(payload: Array[Byte], win: Int): ArrayData = {
    require(win > 0, s"pcm16_energy window must be positive, got $win")
    val nS = payload.length / 2
    val nW = (nS + win - 1) / win
    val out = new Array[Long](nW)
    var j = 0
    while (j < nS) {
      val s = ((payload(2 * j + 1).toInt << 8) | (payload(2 * j) & 0xff)).toLong
      out(j / win) += s * s
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class Pcm16Energy(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"pcm16_energy expects binary payload, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"pcm16_energy expects int window, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pcm16_energy"

  override def nullSafeEval(payload: Any, win: Any): Any =
    Pcm16Util.energies(payload.asInstanceOf[Array[Byte]], win.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, w) => s"graft.functions.Pcm16Util.energies($p, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Pcm16Energy =
    copy(left = newLeft, right = newRight)
}
