package graft

/** The 4-bit↔8-bit pairing invariant (VERDICT r14 item 4): every
  * benchDeferred query is a recall-grading-only configuration whose
  * production scale story lives in a DIFFERENT query key, so the pairing
  * must be machine-checked — a refactor that drops a deferred key from
  * the set (silently promoting a super-linear 4-bit form into the graded
  * bench) or renames/deletes its production twin must fail the suite,
  * not surface as a bench regression two rounds later.
  */
class BenchDeferredSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("benchDeferred is exactly the pairing's key set (no unpaired deferral, no silent promotion)") {
    assert(SparkEntry.benchDeferred == SparkEntry.benchDeferredProductionTwin.keySet)
  }

  test("every deferred key and every production twin is a graded query") {
    val q = SparkEntry.queries.keySet
    val missing = (SparkEntry.benchDeferredProductionTwin.keySet ++
      SparkEntry.benchDeferredProductionTwin.values).filterNot(q)
    assert(missing.isEmpty, s"pairing names non-queries: ${missing.toSeq.sorted}")
  }

  test("every production twin is BENCHED (not itself deferred)") {
    val deferredTwins = SparkEntry.benchDeferredProductionTwin.values.toSet
      .intersect(SparkEntry.benchDeferred)
    assert(deferredTwins.isEmpty,
      s"production twins must run in the untargeted bench: ${deferredTwins.toSeq.sorted}")
  }

  test("a deferred form never stands in for itself") {
    val self = SparkEntry.benchDeferredProductionTwin.collect {
      case (k, v) if k == v => k
    }
    assert(self.isEmpty, s"deferred keys paired with themselves: $self")
  }
}
