package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, EvalMode, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-statistics scan path.
  *
  * `text_stats` / `text_langid` / `text_quality_filter` originally
  * computed their stopword and token-length metrics with higher-order
  * functions (`filter(w, x -> array_contains(...))`,
  * `aggregate(w, ...)`), whose lambdas are interpreted per array element
  * — the known ~5× HOF tax (round-1 bench notes). Correct, and cheap at
  * sf0.1, but these are per-token loops on the 100 TB scan path. Each
  * expression below is the same arithmetic as the HOF chain it replaces
  * — verified element-for-element by the unchanged DuckDB oracles — as
  * one codegen'd call into [[TextStatsUtil]] (same pattern as
  * [[TextHashUtil]]: the loop gains nothing from inlining, staying in
  * whole-stage codegen is what matters).
  */
object TextStatsUtil {

  /** Count of non-null elements of `arr` contained in `set` — the fused
    * form of `size(filter(arr, x -> array_contains(set, x)))` (null
    * elements fail array_contains and are dropped by filter, hence not
    * counted).
    */
  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  /** Eval modes for [[sumStrLen]], mirroring the `Add` the fold replaces. */
  final val ModeLegacy = 0
  final val ModeAnsi = 1
  final val ModeTry = 2

  /** Σ length(x) over the array — the fused form of
    * `aggregate(arr, 0, (acc, x) -> acc + length(x))` (length = numChars,
    * matching Spark's `length` on strings). A null ELEMENT poisons the
    * fold exactly like the HOF form (`acc + length(null)` is null, and
    * null propagates through every later step): returns the
    * `Long.MinValue` sentinel, which [[SumStrLen]] maps to SQL NULL. The
    * accumulator is the same Int the HOF's `Add` uses, stepped per
    * `mode` — LEGACY wraps (an Int sum of ~2³¹ chars goes negative,
    * exactly like the interpreted fold; ADVICE r4: the old −1 sentinel
    * collided with a wrapped total of exactly −1), ANSI throws Spark's
    * arithmetic-overflow error on the overflowing step via
    * `MathUtils.addExact`, TRY nulls the fold from the overflowing step
    * on (null then propagates, so the whole result is NULL → sentinel).
    * The sentinel itself is unreachable: a fold of Int-typed steps can
    * never produce a value outside Int range, so no genuine total —
    * wrapped or not — equals `Long.MinValue`.
    */
  def sumStrLen(arr: ArrayData, mode: Int): Long = {
    val n = arr.numElements()
    var acc = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return java.lang.Long.MIN_VALUE
      val len = arr.getUTF8String(i).numChars()
      mode match {
        case ModeAnsi =>
          acc = org.apache.spark.sql.catalyst.util.MathUtils.addExact(acc, len)
        case ModeTry =>
          val s = acc.toLong + len
          if (s != s.toInt) return java.lang.Long.MIN_VALUE
          acc = s.toInt
        case _ =>
          acc = acc + len // deliberate Int wraparound, = LEGACY Add
      }
      i += 1
    }
    acc.toLong
  }

  /** 31-ary polynomial rolling hash mod 1e9+7 over the characters — the
    * fused form of
    * `aggregate(split(text, ''), 0L, (acc, c) -> (acc*31 + ascii(c)) % 1000000007)`.
    * Parity notes, pinned by `TextStatsExprSpec`:
    *  - Spark's `split(text, '')` yields exactly one element per
    *    codepoint — unlike raw Java `split("", -1)` it drops the
    *    trailing empty match (and '' → []), so the fold has no trailing
    *    `ascii('') = 0` step;
    *  - Spark's `ascii` is `codePointAt(0)`, so iteration is by codepoint
    *    (surrogate pairs are single elements), not by char.
    */
  def rollHash31(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** count_in_set(arr, array('a', ...)): how many elements of `arr` are in
  * the literal string set. The set must be foldable — it is evaluated
  * once (driver / codegen reference), not per row.
  */
case class CountInSet(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!strArr(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"count_in_set expects array<string> as first argument, got ${left.dataType.simpleString}")
    else if (!strArr(right.dataType) || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "count_in_set expects a foldable array<string> set as second argument")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval().asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
        i += 1
      }
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextStatsUtil.countInSet(a.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSetSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.TextStatsUtil.countInSet($a, $setRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSet =
    copy(left = newLeft, right = newRight)
}

/** sum_strlen(arr): total character count over an array<string>.
  *
  * `evalMode` mirrors the `Add` of the HOF fold this expression fuses
  * ([[graft.plans.NativeTextRewriteRule]] copies the matched Add's mode;
  * the SQL-registered form takes the session default like any `+`):
  * LEGACY wraps the Int accumulator, ANSI throws Spark's
  * arithmetic-overflow error, TRY yields NULL from the overflowing step
  * on. Null element → NULL in every mode (fold poisoning), signalled by
  * the out-of-band `Long.MinValue` sentinel (ADVICE r4 — the old −1
  * sentinel was reachable as a genuinely wrapped total).
  */
case class SumStrLen(
    child: Expression,
    evalMode: EvalMode.Value = EvalMode.fromSQLConf(SQLConf.get))
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sum_strlen expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  // Null child → null (nullIntolerant), null element → null, and TRY-mode
  // overflow → null — so the NativeTextRewriteRule rewrite is exact for
  // containsNull arrays too.
  override def nullable: Boolean = true
  override def prettyName: String = "sum_strlen"

  private def modeInt: Int = evalMode match {
    case EvalMode.ANSI => TextStatsUtil.ModeAnsi
    case EvalMode.TRY => TextStatsUtil.ModeTry
    case _ => TextStatsUtil.ModeLegacy
  }

  override def nullSafeEval(input: Any): Any = {
    val s = TextStatsUtil.sumStrLen(input.asInstanceOf[ArrayData], modeInt)
    if (s == java.lang.Long.MIN_VALUE) null else s.toInt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sumStrLen")
      s"""
      long $tmp = graft.functions.TextStatsUtil.sumStrLen($c, $modeInt);
      if ($tmp == Long.MIN_VALUE) { ${ev.isNull} = true; ${ev.value} = 0; }
      else { ${ev.value} = (int) $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SumStrLen =
    copy(child = newChild)
}

/** roll_hash31(text): Rabin-Karp 31-ary rolling hash mod 1e9+7. */
case class RollHash31(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"roll_hash31 expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "roll_hash31"

  override def nullSafeEval(input: Any): Any =
    TextStatsUtil.rollHash31(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsUtil.rollHash31($c)")

  override protected def withNewChildInternal(newChild: Expression): RollHash31 =
    copy(child = newChild)
}
