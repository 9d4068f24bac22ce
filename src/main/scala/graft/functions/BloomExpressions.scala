package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter_bytes, item)` — membership probe of a
  * string against a serialized `org.apache.spark.util.sketch.BloomFilter`
  * carried as a foldable BINARY literal.
  *
  * The decontamination shape at 100 TB: an eval-suite n-gram set is far
  * too large to broadcast raw (10⁸ 13-grams ≈ tens of GB of strings) but
  * compresses to a fixed-size bit array (~1 GB at 1% fpp) built once with
  * the public distributed builder (`df.stat.bloomFilter`) and shipped to
  * every scan task as a literal — the probe then runs scan-side inside
  * whole-stage codegen with NO join, and only the (tiny) might-contain
  * survivor set reaches the exact verification join that removes false
  * positives. Same ladder position as [[CountInSet]]: the filter object
  * deserializes ONCE per task via the codegen reference-object mechanism,
  * never per row.
  *
  * No false negatives (bloom property) ⇒ prefilter + exact verify is
  * semantically exact, which is how `text_contamination_bloom` can share
  * `text_contamination`'s DuckDB oracle verbatim.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects a foldable serialized bloom filter " +
          s"(binary) as first argument, got ${left.dataType.simpleString}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a string item, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(b: Any, s: Any): Any =
    filter.mightContainString(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, s) =>
      s"${ev.value} = $ref.mightContainString($s.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
