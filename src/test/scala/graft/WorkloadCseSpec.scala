package graft

import graft.engine.WorkloadCse

/** The workload CSE advisor finds genuinely shared pipelines and does
  * not hallucinate sharing across unrelated tables.
  */
class WorkloadCseSpec extends SparkSpecBase {

  private def frame(name: String) = SparkEntry.queries(name)(spark, sf())

  test("plan-and-apply share the budget pipeline; unrelated tables share nothing") {
    val frames = Map(
      "text_token_budget" -> frame("text_token_budget"),
      "text_token_budget_apply" -> frame("text_token_budget_apply"),
      "q2_filter_project" -> frame("q2_filter_project"))
    val rows = WorkloadCse.report(frames, minNodes = 2, minQueries = 2)
    // the whole planning chain (per-source sums -> weights -> allocation)
    // is embedded in the apply query — the advisor must surface it
    val shared = rows.filter { case (_, qs, _, _) =>
      qs.contains("text_token_budget") && qs.contains("text_token_budget_apply")
    }
    assert(shared.nonEmpty, rows.map(_._2).mkString("|"))
    assert(shared.head._4 > 0) // positive savings proxy
    // nothing claims sharing between the documents pipeline and lineitem
    assert(!rows.exists { case (_, qs, _, _) =>
      qs.contains("q2_filter_project") &&
        (qs.contains("text_token_budget") || qs.contains("text_token_budget_apply"))
    })
  }

  test("same-table scans fingerprint identically at the leaf level") {
    val frames = Map(
      "q2_filter_project" -> frame("q2_filter_project"),
      "q11_predicates" -> frame("q11_predicates"))
    val rows = WorkloadCse.report(frames, minNodes = 1, minQueries = 2)
    // both read lineitem: at least the shared scan must appear
    assert(rows.exists { case (_, qs, _, _) =>
      qs == Seq("q11_predicates", "q2_filter_project")
    }, rows.map(r => (r._2, r._3)).mkString("|"))
  }
}
