package graft.format

import org.apache.spark.sql.{DataFrame, Row}

/** Result formatters matching the reference's sinks
  * (/root/reference/src/exec/formatter.cpp):
  *
  *  - Markdown: width-aligned pipe table, `(no results)` for empty
  *    (formatter.cpp:9-66);
  *  - CSV: RFC-style quoting — quote iff the cell contains a comma,
  *    quote, or newline; embedded quotes doubled (formatter.cpp:68-128).
  *
  * Formatters are presentation: they run on an explicitly LIMITed
  * collect (`maxRows`), never on an unbounded result — the 100 TB rule
  * that the driver only ever sees a bounded sample.
  */
object Formatters {

  val DefaultMaxRows = 1000

  /** Fetches up to maxRows rows plus a 1-row lookahead so truncation is
    * detectable without a count() pass (reference formatter.cpp prints
    * every row; our cap needs an explicit marker, not a silent clip).
    */
  private def cells(df: DataFrame, maxRows: Int): (Array[String], Seq[Array[String]], Boolean) = {
    val names = df.columns
    val probe = if (maxRows == Int.MaxValue) maxRows else maxRows + 1
    val taken = df.take(probe)
    val truncated = taken.length > maxRows
    val rows = taken.take(maxRows).map { r: Row =>
      names.indices.map { i =>
        val v = r.get(i)
        if (v == null) "NULL" else v.toString
      }.toArray
    }.toSeq
    (names, rows, truncated)
  }

  /** Reference-style markdown table (formatter.cpp:9-66), plus a
    * `(first N rows)` trailer when the row cap clipped the result.
    */
  def markdown(df: DataFrame, maxRows: Int = DefaultMaxRows): String = {
    val (names, rows, truncated) = cells(df, maxRows)
    if (rows.isEmpty) return "(no results)\n"
    val widths = names.indices.map { i =>
      (names(i).length +: rows.map(_(i).length)).max
    }
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("|-", "-|-", "-|")
    val body = (line(names.toSeq) +: sep +: rows.map(r => line(r.toSeq)))
      .mkString("", "\n", "\n")
    if (truncated) body + s"(first $maxRows rows)\n" else body
  }

  /** RFC-quoted CSV (formatter.cpp:68-128). The truncation notice goes to
    * stderr so stdout stays machine-parseable CSV.
    */
  def csv(df: DataFrame, maxRows: Int = DefaultMaxRows): String = {
    val (names, rows, truncated) = cells(df, maxRows)
    if (truncated)
      System.err.println(s"(first $maxRows rows; use --all-rows for the full result)")
    def quote(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    (names.toSeq +: rows.map(_.toSeq))
      .map(_.map(quote).mkString(",")).mkString("", "\n", "\n")
  }
}
