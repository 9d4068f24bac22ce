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

  private def cells(df: DataFrame, maxRows: Int): (Array[String], Seq[Array[String]]) = {
    val names = df.columns
    val rows = df.take(maxRows).map { r: Row =>
      names.indices.map { i =>
        val v = r.get(i)
        if (v == null) "NULL" else v.toString
      }.toArray
    }.toSeq
    (names, rows)
  }

  /** Reference-style markdown table (formatter.cpp:9-66). */
  def markdown(df: DataFrame, maxRows: Int = DefaultMaxRows): String = {
    val (names, rows) = cells(df, maxRows)
    if (rows.isEmpty) return "(no results)\n"
    val widths = names.indices.map { i =>
      (names(i).length +: rows.map(_(i).length)).max
    }
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("|-", "-|-", "-|")
    (line(names.toSeq) +: sep +: rows.map(r => line(r.toSeq))).mkString("", "\n", "\n")
  }

  /** RFC-quoted CSV (formatter.cpp:68-128). */
  def csv(df: DataFrame, maxRows: Int = DefaultMaxRows): String = {
    val (names, rows) = cells(df, maxRows)
    def quote(s: String): String =
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    (names.toSeq +: rows.map(_.toSeq))
      .map(_.map(quote).mkString(",")).mkString("", "\n", "\n")
  }
}
