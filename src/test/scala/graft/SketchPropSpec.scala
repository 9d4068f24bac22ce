package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{LshHash, SketchHash, TopKBuffer}

/** ScalaCheck properties for the sketch/top-k primitives — these are the
  * pieces whose distributed correctness rests on algebraic laws (merge
  * associativity, subset monotonicity), so they get law-level checks
  * rather than example-level ones. No SparkSession needed.
  */
object SketchPropSpec extends Properties("Sketches") {

  private val ordGen: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6, 1e6),
    1 -> Gen.oneOf(Double.NaN, 0.0, -0.0, Double.PositiveInfinity, Double.NegativeInfinity))
  private val pairGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(ordGen, Gen.chooseNum(0L, 1000L)))

  // Spark's double total order: NaN greatest, −0.0 < 0.0
  private def reference(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sorted(Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long))
      .take(k)

  // observable output order: what TopKByAgg.eval emits (the buffer's
  // internal layout is a min-heap since round 3, not a sorted array)
  private def drain(buf: TopKBuffer): List[(Double, Long)] =
    buf.sortedIndices().map(j => (buf.ords(j.intValue), buf.ids(j.intValue))).toList

  /** NaN-safe list equality: Scala's `(NaN, x) == (NaN, x)` is FALSE
    * (primitive == on the boxed double), which silently falsified these
    * properties whenever NaN reached the top-k. java.lang.Double.compare
    * treats NaN == NaN and keeps −0.0 ≠ 0.0, matching the total order
    * the buffer sorts by.
    */
  private def eqPairs(a: List[(Double, Long)], b: List[(Double, Long)]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((o1, i1), (o2, i2)) =>
      java.lang.Double.compare(o1, o2) == 0 && i1 == i2
    }


  // ---------------------------------------------------- winnowing laws
  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar, 1 -> Gen.const(' '))).map(_.mkString))

  private def winnowSet(s: String, k: Int, w: Int): Set[Long] = {
    val arr = graft.functions.TextHashUtil.winnowHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  /** Naive reference: per-position k-gram polynomial hash, sliding
    * w-window minima, distinct. */
  private def winnowNaive(s: String, k: Int, w: Int): Set[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Set.empty
    val hs = cps.sliding(k).map(_.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)).toArray
    if (hs.length <= w) Set(hs.min)
    else hs.sliding(w).map(_.min).toSet
  }

  property("winnowHashes == naive sliding-min reference") =
    forAll(asciiText, Gen.choose(2, 6), Gen.choose(2, 5)) { (s, k, w) =>
      winnowSet(s, k, w) == winnowNaive(s, k, w)
    }

  property("winnowing guarantee: shared substring of len >= w+k-1 shares a fingerprint") =
    forAll(asciiText, asciiText, asciiText, Gen.choose(2, 6), Gen.choose(2, 5)) {
      (pre1, pre2, core0, k, w) =>
        // pad the shared core up to the guarantee length with a fixed tail
        val need = w + k - 1
        val core = (core0 + "X" * need).take(math.max(core0.length, need))
        val d1 = pre1 + core
        val d2 = pre2 + core
        (winnowSet(d1, k, w) intersect winnowSet(d2, k, w)).nonEmpty
    }

  property("TopKBuffer sequential insert == sort-take-k") =
    forAll(pairGen, Gen.choose(1, 8)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (o, i) => buf.insert(o, i) }
      eqPairs(drain(buf), reference(xs, k))
    }

  property("TopKBuffer merge of any split == unsplit result (partial-agg law)") =
    forAll(pairGen, Gen.choose(1, 8), Gen.choose(0, 100)) { (xs, k, cut) =>
      val at = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (a, b) = xs.splitAt(at)
      val ba = new TopKBuffer(k); a.foreach { case (o, i) => ba.insert(o, i) }
      val bb = new TopKBuffer(k); b.foreach { case (o, i) => bb.insert(o, i) }
      // merge bb into ba, as the final aggregation step does
      (0 until bb.n).foreach(j => ba.insert(bb.ords(j), bb.ids(j)))
      eqPairs(drain(ba), reference(xs, k))
    }

  property("TopKBuffer large-k lazy growth: insert beyond initial capacity") =
    forAll(Gen.listOfN(300, Gen.zip(ordGen, Gen.chooseNum(0L, 100000L)))) { xs =>
      val buf = new TopKBuffer(1 << 16) // far above the 16-slot initial arrays
      xs.foreach { case (o, i) => buf.insert(o, i) }
      eqPairs(drain(buf), reference(xs, 1 << 16))
    }

  property("TopKBuffer serialize/deserialize round-trip preserves contents") =
    forAll(pairGen, Gen.choose(1, 8)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (o, i) => buf.insert(o, i) }
      // mirror TopKByAgg.serialize/deserialize: raw entries out, insert in
      val entries = (0 until buf.n).map(j => (buf.ords(j), buf.ids(j)))
      val back = new TopKBuffer(k)
      entries.foreach { case (o, i) => back.insert(o, i) }
      eqPairs(drain(back), reference(xs, k))
    }

  property("SketchHash.mix: 64 family members pairwise distinct per input") =
    forAll(Gen.long) { h =>
      (0 until 64).map(SketchHash.mix(h, _)).distinct.size == 64
    }

  property("LshHash.weight in [-1, 1) and deterministic") =
    forAll(Gen.choose(0, 63), Gen.choose(0, 1023)) { (p, d) =>
      val w = LshHash.weight(p, d)
      w >= -1.0 && w < 1.0 && w == LshHash.weight(p, d)
    }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.oneOf("the", "a", "fox", "b", "über", ""),
      Gen.alphaNumStr.map(_.take(5)))).map(_.mkString(" "))

  property("wordNgrams == sorted distinct naive sliding (split-compatible)") =
    forAll(textGen, Gen.choose(1, 4)) { (text, n) =>
      val got = graft.functions.TextHashUtil
        .wordNgrams(org.apache.spark.unsafe.types.UTF8String.fromString(text), n)
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString).toList
      val toks = text.split(" ", -1)
      val want = toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toList.distinct.sorted
      gotSeq == want
    }
}
