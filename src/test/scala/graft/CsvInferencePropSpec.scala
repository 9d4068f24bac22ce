package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.catalog.CsvInference

/** ScalaCheck properties for the reference's CSV inference rules
  * (/root/reference/src/storage/csv_loader.cpp:42-162) — SURVEY §5's
  * suggested property tests. Kept to few cases per property: each case
  * runs two Spark jobs.
  */
object CsvInferencePropSpec extends Properties("CsvInference") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def spark = SparkSpecBase.session

  private def infer(rows: Seq[String]): String = {
    val f = Files.createTempFile("prop", ".csv")
    Files.writeString(f, ("c" +: rows).mkString("\n") + "\n")
    val (df, _) = CsvInference.load(spark, f.toString, "p")
    df.schema("c").dataType.simpleString
  }

  private val longs = Gen.nonEmptyListOf(Gen.choose(-1000000L, 1000000L))
  private val doubles = Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)
    .suchThat(d => d != math.floor(d))) // genuinely fractional
  private val words = Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))

  property("all integers infer bigint") = forAll(longs) { xs =>
    // 8-digit values inside the date window would legitimately infer date
    val safe = xs.filterNot(x => x >= 19000000L && x <= 21000000L)
    safe.isEmpty || infer(safe.map(_.toString)) == "bigint"
  }

  property("integral doubles like 2.0 still infer bigint") = forAll(longs) { xs =>
    val safe = xs.filterNot(x => x >= 19000000L && x <= 21000000L)
    safe.isEmpty || infer(safe.map(x => s"$x.0")) == "bigint"
  }

  property("any fractional value makes the column double") = forAll(doubles) { xs =>
    infer(xs.map(_.toString)) == "double"
  }

  property("one alpha cell flips the column to string") = forAll(longs, words) {
    (xs, ws) => infer(xs.map(_.toString) ++ ws.take(1)) == "string"
  }

  property("8-digit ints in the date window infer int (DATE32)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(19000000, 20999999))) { xs =>
      infer(xs.map(_.toString)) == "int"
    }
}
