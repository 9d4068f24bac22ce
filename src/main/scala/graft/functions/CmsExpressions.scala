package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch_bytes, item)` — estimated occurrence count of a
  * string against a serialized `org.apache.spark.util.sketch.CountMinSketch`
  * carried as a foldable BINARY literal.
  *
  * The heavy-hitters shape at 100 TB: finding all tokens above a frequency
  * threshold exactly means shuffling the full token stream (one row per
  * token occurrence — at 100 TB of text that is the corpus itself). A
  * count-min sketch compresses the frequency table to a fixed-size counter
  * grid (depth × width ints, KBs–MBs regardless of corpus size), built
  * distributed by the public `df.stat.countMinSketch` builder (merge of
  * per-partition grids), and shipped to every scan task as one literal.
  * The probe runs scan-side in whole-stage codegen; only tokens whose
  * estimate clears the threshold reach the exact count that removes the
  * sketch's overestimates.
  *
  * CMS error is ONE-SIDED (`estimate >= true count`, Cormode & Muthukrishnan
  * 2005), so prefilter + exact verify is semantically exact — which is how
  * `text_heavy_hitters` shares a plain `GROUP BY … HAVING` DuckDB oracle.
  * Same ladder position as [[BloomMightContain]]: the sketch deserializes
  * ONCE per task via the codegen reference-object mechanism, never per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "cms_estimate expects a foldable serialized count-min sketch " +
          s"(binary) as first argument, got ${left.dataType.simpleString}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects a string item, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(b: Any, s: Any): Any =
    sketch.estimateCount(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, s) =>
      s"${ev.value} = $ref.estimateCount($s.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
