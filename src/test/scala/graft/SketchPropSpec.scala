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

  property("TopKBuffer sequential insert == sort-take-k") =
    forAll(pairGen, Gen.choose(1, 8)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (o, i) => buf.insert(o, i) }
      (0 until buf.n).map(j => (buf.ords(j), buf.ids(j))).toList == reference(xs, k)
    }

  property("TopKBuffer merge of any split == unsplit result (partial-agg law)") =
    forAll(pairGen, Gen.choose(1, 8), Gen.choose(0, 100)) { (xs, k, cut) =>
      val at = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (a, b) = xs.splitAt(at)
      val ba = new TopKBuffer(k); a.foreach { case (o, i) => ba.insert(o, i) }
      val bb = new TopKBuffer(k); b.foreach { case (o, i) => bb.insert(o, i) }
      // merge bb into ba, as the final aggregation step does
      (0 until bb.n).foreach(j => ba.insert(bb.ords(j), bb.ids(j)))
      (0 until ba.n).map(j => (ba.ords(j), ba.ids(j))).toList == reference(xs, k)
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
}
