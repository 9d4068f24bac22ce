package graft

/** The codified blowup-as-bug-finder loop (VERDICT r12 item 9): round 12
  * found four real at-scale bugs (BIGINT overflows, a √0 divide) only
  * because its new queries happened to get ad-hoc 10× runs. This gate
  * makes that mandatory — a query cannot ship without a measured 10×
  * verdict in tools/blowup_ledger.json:
  *
  *  - every `SparkEntry.queries` entry must appear in the ledger
  *    (produce one with the targeted pair:
  *    `SPARK_GRAFT_QUERIES=<q> runMain graft.Bench` at 1× and with
  *    `SPARK_GRAFT_BLOWUP=10`);
  *  - its 10× time must be a real measurement (t10 > 0 — a crashed
  *    blowup run records -1 and fails here, not in a later round);
  *  - a ratio above 12 (well past linear-in-data ≈ 10; ratios are
  *    floor-relative, see the ledger _doc) must carry a `note`
  *    explaining why the growth is structural and acceptable — silence
  *    is how the 4-bit band configs shipped super-linear in r10.
  */
class BlowupLedgerSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val ledger: Map[String, (Double, Double, Boolean)] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/blowup_ledger.json")), "UTF-8")
    // entries are flat {"name": {"t1":..,"t10":..,"ratio":..[,"note":".."]}}
    val entry = ("\"([A-Za-z0-9_]+)\":\\s*\\{([^{}]*)\\}").r
    entry.findAllMatchIn(txt.substring(txt.indexOf("\"entries\""))).map { m =>
      val body = m.group(2)
      def num(k: String): Double =
        s""""$k":\\s*(-?[0-9.]+)""".r.findFirstMatchIn(body)
          .map(_.group(1).toDouble).getOrElse(Double.NaN)
      m.group(1) -> ((num("t10"), num("ratio"), body.contains("\"note\"")))
    }.toMap
  }

  test("every graded query has a measured 10x blowup verdict") {
    val missing = SparkEntry.queries.keySet -- ledger.keySet
    assert(missing.isEmpty,
      s"queries shipped without a 10x blowup entry: ${missing.toSeq.sorted}\n" +
        "run the targeted pair and add them to tools/blowup_ledger.json")
  }

  test("10x runs completed (no crash recorded as a time)") {
    val crashed = ledger.collect { case (q, (t10, _, _)) if !(t10 > 0) => q }
    assert(crashed.isEmpty, s"10x blowup failed for: ${crashed.toSeq.sorted}")
  }

  test("super-linear ratios carry an explanation") {
    val silent = ledger.collect {
      case (q, (_, r, hasNote)) if r > 12 && !hasNote => q
    }
    assert(silent.isEmpty,
      s"ratio > 12 without a note: ${silent.toSeq.sorted}")
  }
}
