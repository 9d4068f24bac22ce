package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Rationale (SURVEY §7.4 / builder rules): a whole-stage-codegen'd
  * `Expression` beats the `zip_with` + `aggregate` higher-order-function
  * formulation (interpreted per element) by avoiding one closure dispatch
  * and one boxed value per array element per row. Semantics are kept
  * bit-identical to that fold — left-to-right double accumulation over
  * `(double) a[i] * (double) b[i]` — so results still hash-match the
  * DuckDB oracle's list_transform/list_aggregate fold.
  *
  * The reference engine has no function surface at all (its expression
  * evaluator throws on any FUNC_CALL, /root/reference/src/exec/
  * expression.cpp:202-203); these are extension operators.
  */

/** dot_f32(a, b): double dot product of two float32 vectors. */
case class DotProductF32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 expects two array<float> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

/** cosine_f32(a, b): cosine similarity of two float32 vectors, one fused
  * pass for dot product and both norms. Bit-compatible with
  * dot/(sqrt(na)*sqrt(nb)) over sequential double folds.
  */
case class CosineSimF32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_f32 expects two array<float> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimF32 =
    copy(left = newLeft, right = newRight)
}

/** Deterministic pseudo-random hyperplane weights for sign-LSH.
  * splitmix64 finalizer over (plane, dim) — reproducible on any cluster
  * size with no RNG state to ship. A top-level object gets Java static
  * forwarders, so generated code can call
  * `graft.functions.LshHash.weight(p, d)` directly.
  */
object LshHash {

  /** Guard for nullable-element arrays: getFloat/getLong on a null slot
    * silently reads 0.0/0L, which would skew LSH signatures without any
    * error (ADVICE r2). Called (from eval and generated code) only when
    * the input's ArrayType says containsNull — statically free on the
    * usual non-null pipelines.
    */
  def requireNoNulls(arr: org.apache.spark.sql.catalyst.util.ArrayData, fn: String): Unit = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"$fn: null array element at index $i (drop or impute nulls first)")
      i += 1
    }
  }

  /** u(p, d) ∈ [−1, 1), uniform, deterministic. */
  def weight(p: Int, d: Int): Double = {
    var z = ((p.toLong << 32) | (d.toLong & 0xFFFFFFFFL)) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / 9.223372036854775807E18
  }

  @volatile private var cached: Array[Array[Double]] = Array.empty

  /** Memoized [plane][dim] weight table, grown on demand — the weights
    * depend only on (p, d), so the per-row codegen loop indexes this
    * instead of re-running splitmix for every element of every row
    * (nBits × dim mixes per row otherwise). One table per executor JVM.
    */
  def table(bits: Int, dims: Int): Array[Array[Double]] = {
    val c = cached
    if (c.length >= bits && (bits == 0 || c(0).length >= dims)) c
    else synchronized {
      val c2 = cached
      if (c2.length >= bits && (bits == 0 || c2(0).length >= dims)) c2
      else {
        val nb = math.max(bits, math.max(c2.length, 64))
        val nd = math.max(dims, if (c2.isEmpty) 64 else c2(0).length)
        val t = Array.tabulate(nb, nd)(weight)
        cached = t
        t
      }
    }
  }
}

/** sign_lsh(vec, planeOffset, nBits): random-hyperplane signature of a
  * float32 vector — bit p of the result is
  * `sign(Σ_d vec[d] · u(planeOffset + p, d))` with u from
  * [[LshHash.weight]]. One fused O(nBits × dim) pass in generated code;
  * the higher-order-function formulation this replaces was interpreted
  * per element (HOF tax, see round-1 bench notes).
  *
  * `planeOffset` (round 3) lifts the 64-plane ceiling: signatures wider
  * than one long are built from multiple calls over disjoint plane
  * ranges — e.g. a 16-band × 8-bit banding computes band b's key as
  * `sign_lsh(vec, b*8, 8)`. Bits-per-band is THE selectivity knob for
  * the LSH self-join: bucket occupancy is ~N/2^bits, so bits must grow
  * with log N or the candidate join goes quadratic (measured in
  * SCALING_MEASURED.md). The two-argument form `sign_lsh(vec, nBits)`
  * (offset 0) is kept for compatibility.
  */
case class SignLsh(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val intType = org.apache.spark.sql.types.IntegerType
    if (!arrOk)
      TypeCheckResult.TypeCheckFailure(
        s"sign_lsh expects array<float> as first argument, got ${first.dataType.simpleString}")
    else if (second.dataType != intType || !second.foldable ||
      third.dataType != intType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "sign_lsh expects literal int plane offset and bit count")
    else (second.eval(), third.eval()) match {
      case (null, _) | (_, null) =>
        TypeCheckResult.TypeCheckFailure(
          "sign_lsh plane offset and bit count must be non-null literal ints")
      case (off: Int, bits: Int) =>
        if (off < 0 || off > (1 << 20))
          TypeCheckResult.TypeCheckFailure(s"sign_lsh plane offset out of range: $off")
        else if (bits >= 1 && bits <= 64) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"sign_lsh bit count must be in [1, 64], got $bits")
    }
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_lsh"

  private lazy val elementsNullable: Boolean = first.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (elementsNullable) LshHash.requireNoNulls(x, "sign_lsh")
    val off = b.asInstanceOf[Int]
    val bits = c.asInstanceOf[Int]
    val n = x.numElements()
    val w = LshHash.table(off + bits, n)
    var sig = 0L
    var p = 0
    while (p < bits) {
      var s = 0.0
      val wp = w(off + p)
      var d = 0
      while (d < n) {
        s += x.getFloat(d).toDouble * wp(d)
        d += 1
      }
      if (s > 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val w = ctx.freshName("w")
      val wp = ctx.freshName("wp")
      val nullGuard =
        if (elementsNullable) s"graft.functions.LshHash.requireNoNulls($a, \"sign_lsh\");"
        else ""
      s"""
         |$nullGuard
         |int $n = $a.numElements();
         |double[][] $w = graft.functions.LshHash.table($b + $c, $n);
         |long $sig = 0L;
         |for (int $p = 0; $p < $c; $p++) {
         |  double $s = 0.0;
         |  double[] $wp = $w[$b + $p];
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += ((double) $a.getFloat($d)) * $wp[$d];
         |  }
         |  if ($s > 0.0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SignLsh =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** l2sq_i64(a, b): exact squared-L2 distance of two bigint (fixed-point)
  * vectors — the edge-ranking kernel under [[graft.ext.Similarity]]'s
  * label spreading: semantics identical to the
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, +)` fold it
  * replaces (left-to-right long accumulation, wrap-on-overflow like the
  * SQL form), but one codegen'd loop instead of an interpreted closure
  * per element — measured ~3× on the banded-candidate volume.
  */
case class L2SqI64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2sq_i64 expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2sq_i64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqI64 =
    copy(left = newLeft, right = newRight)
}
