package graft

import graft.format.Formatters

/** Formatter shape parity with the reference's sinks
  * (/root/reference/src/exec/formatter.cpp; smoke.sh assertions).
  */
class FormattersSpec extends SparkSpecBase {

  test("markdown table is width-aligned with pipes") {
    import spark.implicits._
    val df = Seq((1L, "Alice"), (2L, "Bob")).toDF("id", "name")
    val out = Formatters.markdown(df)
    val lines = out.split("\n")
    assert(lines(0).startsWith("| id") && lines(0).endsWith("|"))
    assert(lines(1).matches("\\|[-|]+\\|"))
    assert(lines.length == 4)
    assert(lines.map(_.length).distinct.length == 1) // aligned widths
  }

  test("markdown empty result prints (no results) (formatter.cpp:24-27)") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b").filter("a > 99")
    assert(Formatters.markdown(df) == "(no results)\n")
  }

  test("csv formatter quotes commas and doubles embedded quotes (formatter.cpp:68-128)") {
    import spark.implicits._
    val df = Seq(("a,b", "say \"hi\"", "plain")).toDF("c1", "c2", "c3")
    val out = Formatters.csv(df)
    assert(out == "c1,c2,c3\n\"a,b\",\"say \"\"hi\"\"\",plain\n")
  }

  test("null cells render as NULL") {
    import spark.implicits._
    val df = Seq((Some(1), None: Option[String]), (Some(2), Some("y"))).toDF("a", "b")
    assert(Formatters.csv(df).contains("1,NULL"))
  }

  test("markdown marks truncation; exact-cap and all-rows do not") {
    import spark.implicits._
    val df = (1 to 10).toDF("n").orderBy("n")
    val clipped = Formatters.markdown(df, maxRows = 3)
    assert(clipped.endsWith("(first 3 rows)\n"))
    assert(clipped.split("\n").count(_.startsWith("| ")) == 4) // header + 3 rows
    // result exactly at the cap is NOT marked (lookahead row missing)
    assert(!Formatters.markdown(df, maxRows = 10).contains("(first"))
    // Int.MaxValue = --all-rows: full output, no marker, no overflow
    val full = Formatters.markdown(df, maxRows = Int.MaxValue)
    assert(!full.contains("(first") && full.split("\n").count(_.startsWith("| ")) == 11)
  }

  test("csv truncation keeps stdout parseable (no marker line in payload)") {
    import spark.implicits._
    val df = (1 to 10).toDF("n").orderBy("n")
    val out = Formatters.csv(df, maxRows = 3)
    assert(out == "n\n1\n2\n3\n") // marker goes to stderr, not the payload
  }
}
