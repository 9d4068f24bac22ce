package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text-sketch expressions.
  *
  * These move the WHOLE signature computation into the scan-side
  * projection: a document row goes in, its (deduplicated) shingle-hash
  * set / simhash / minhash signature comes out — no explode, no window,
  * no groupBy. Round 1 computed the same values with posexplode + a
  * `lead` window + dropDuplicates + a 64-aggregate groupBy, which cost
  * THREE shuffles of the full token stream before the first candidate
  * was generated. At 100 TB the difference is the whole game: signatures
  * are embarrassingly parallel per document, and the first exchange in
  * the plan is the (tiny) LSH band join.
  *
  * Codegen: each expression emits a single static call into
  * [[TextHashUtil]] — the loop itself gains nothing from inlining into
  * generated Java, but staying inside whole-stage codegen avoids the
  * CodegenFallback row-iterator break.
  *
  * Hashing: FNV-1a 64 over UTF-8 token bytes, combined/finalized with
  * splitmix64 ([[SketchHash.mix]]). Only equality classes matter
  * downstream (Jaccard over hash sets, signature bits); the DuckDB
  * oracle works on the string shingles and agrees w.h.p. (collision odds
  * n²/2⁶⁵).
  */
object TextHashUtil {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  private def hashBytes(b: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * FnvPrime
      i += 1
    }
    h
  }

  /** Tokenize exactly like Spark's `split(text, ' ')`: single-space
    * regex, keep empty tokens (limit -1), so results agree with the
    * oracle's string_split.
    */
  private def tokenHashes(s: UTF8String): Array[Long] = {
    val toks = s.toString.split(" ", -1)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      th(i) = hashBytes(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    th
  }

  /** Winnowing fingerprints (Schleimer et al., the MOSS sketch): the
    * 31-ary mod-1e9+7 polynomial hash of every k-char gram (the
    * [[TextStatsUtil.rollHash31]] arithmetic, windowed — ascii/code
    * points, so the DuckDB replay is exact), then the minimum of every
    * w-consecutive-hash window, distinct, sorted. Guarantee: two
    * documents sharing any substring of length ≥ w+k−1 chars share at
    * least one fingerprint. Texts shorter than k chars yield an empty
    * array; k ≤ length < k+w−1 yields the single global minimum.
    */
  def winnowHashes(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 31 + cps(i + j)) % 1000000007L
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val sel = new Array[Long](nw)
    var p = 0
    while (p < nw) {
      var mn = Long.MaxValue
      var q = p
      val end = math.min(p + w, m)
      while (q < end) {
        if (hs(q) < mn) mn = hs(q)
        q += 1
      }
      sel(p) = mn
      p += 1
    }
    java.util.Arrays.sort(sel)
    var wr = 1
    var r = 1
    while (r < sel.length) {
      if (sel(r) != sel(r - 1)) { sel(wr) = sel(r); wr += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, wr))
  }

  /** Distinct word-3-gram shingle hashes, sorted (order is irrelevant to
    * every consumer; sorted keeps output deterministic). Documents with
    * fewer than 3 tokens yield an empty array.
    */
  def shingleHashes(s: UTF8String): ArrayData = {
    val th = tokenHashes(s)
    val n = th.length
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val raw = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      var c = th(i)
      c = c * FnvPrime ^ th(i + 1)
      c = c * FnvPrime ^ th(i + 2)
      raw(i) = SketchHash.mix(c, 0)
      i += 1
    }
    java.util.Arrays.sort(raw)
    var w = 1
    var r = 1
    while (r < raw.length) {
      if (raw(r) != raw(r - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }

  /** 64-bit SimHash over ALL token occurrences (not deduplicated): bit i
    * is set iff a strict majority of tokens have bit i set.
    */
  def simhash(s: UTF8String): Long = {
    val th = tokenHashes(s)
    val counts = new Array[Int](64)
    var t = 0
    while (t < th.length) {
      val h = th(t)
      var i = 0
      while (i < 64) {
        counts(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (2L * counts(i) > th.length) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Distinct space-joined word n-grams, sorted (deterministic output;
    * order is irrelevant to consumers). Tokenization matches
    * `split(text, ' ')` limit -1, like [[tokenHashes]], so results agree
    * with the oracle's string_split. Fewer than n tokens → empty array.
    *
    * This is the STRING-shingle sibling of [[shingleHashes]] for
    * consumers that need the gram text itself (n-gram vocabularies,
    * contamination probes): one scan-side call replaces the
    * posexplode + per-doc window + corpus-wide distinct pipeline, whose
    * token-stream shuffle dominated those queries' cost.
    */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (n <= 0 || toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** [[minhashArr]] with a null-element guard, used when the input's
    * ArrayType says containsNull (getLong on a null slot silently reads
    * 0L and would corrupt the signature, ADVICE r2).
    */
  def minhashArrStrict(arr: ArrayData): ArrayData = {
    LshHash.requireNoNulls(arr, "minhash_arr")
    minhashArr(arr)
  }

  /** 64 minhash minima over an array of 8-byte element hashes, using the
    * same splitmix64 family as [[MinHashSigAgg]].
    */
  def minhashArr(arr: ArrayData): ArrayData = {
    val out = Array.fill(64)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val h = arr.getLong(e)
      var i = 0
      while (i < 64) {
        val hi = SketchHash.mix(h, i)
        if (hi < out(i)) out(i) = hi
        i += 1
      }
      e += 1
    }
    new GenericArrayData(out)
  }
}

/** shingle_hashes(text): array<bigint> of distinct word-3-gram hashes. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.shingleHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** simhash64(text): 64-bit SimHash signature of the document's tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** word_ngrams(text, n): distinct space-joined word n-grams as
  * array<string>, computed scan-side in whole-stage codegen.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
        right.dataType == org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(text: Any, n: Any): Any =
    TextHashUtil.wordNgrams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.TextHashUtil.wordNgrams($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}

/** minhash_arr(arr): 64 minhash minima of an array<bigint> hash set. */
case class MinHashArr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_arr expects array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_arr"

  private lazy val helper: String = child.dataType match {
    case ArrayType(_, true) => "minhashArrStrict"
    case _ => "minhashArr"
  }

  override def nullSafeEval(input: Any): Any =
    if (helper == "minhashArrStrict")
      TextHashUtil.minhashArrStrict(input.asInstanceOf[ArrayData])
    else TextHashUtil.minhashArr(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.$helper($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashArr =
    copy(child = newChild)
}

/** winnow_hashes(text, k, w): array<bigint> of distinct winnowing
  * fingerprints — min k-gram hash of each w-hash window
  * ([[TextHashUtil.winnowHashes]]). k and w must be literal ints.
  */
case class WinnowHashes(first: Expression, second: Expression,
    third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val intType = org.apache.spark.sql.types.IntegerType
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_hashes expects string, got ${first.dataType.simpleString}")
    else if (second.dataType != intType || !second.foldable ||
      third.dataType != intType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "winnow_hashes expects literal int gram size and window size")
    else (second.eval(), third.eval()) match {
      case (null, _) | (_, null) =>
        TypeCheckResult.TypeCheckFailure(
          "winnow_hashes gram and window sizes must be non-null literal ints")
      case (k: Int, w: Int) =>
        if (k < 1 || k > 1024)
          TypeCheckResult.TypeCheckFailure(s"winnow_hashes gram size out of range: $k")
        else if (w < 1 || w > 1024)
          TypeCheckResult.TypeCheckFailure(s"winnow_hashes window size out of range: $w")
        else TypeCheckResult.TypeCheckSuccess
    }
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_hashes"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    TextHashUtil.winnowHashes(a.asInstanceOf[UTF8String],
      b.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) =>
      s"graft.functions.TextHashUtil.winnowHashes($t, $k, $w)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): WinnowHashes =
    copy(first = newFirst, second = newSecond, third = newThird)
}
