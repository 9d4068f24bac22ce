package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV ingestion with the reference's type-inference rules
  * (/root/reference/src/storage/csv_loader.cpp:42-162), which Spark's own
  * `inferSchema` cannot reproduce (SURVEY.md §7.4):
  *
  *  - DATE32 iff every value is exactly 8 chars and parses to an int in
  *    [19000000, 21000000] (csv_loader.cpp:49-66). Kept as yyyymmdd
  *    IntegerType for bit-identical output per SURVEY §7.5.2 (int
  *    comparisons order identically to dates).
  *  - INT64 iff every value parses as a double that is integral and in
  *    i64 range — so "2.0" and "1e3" infer INT64 (csv_loader.cpp:85-102).
  *  - DOUBLE iff every value parses as a double (csv_loader.cpp:121-133).
  *  - else STRING (dictionary encoding is an internal Parquet/Tungsten
  *    concern in Spark — ids are never surfaced, SURVEY §1.2).
  *
  * Load-time statistics (min/max/NDV per column + row count) mirror the
  * reference's ColumnStats/TableMeta (catalog.h:16-43) and power DESCRIBE.
  *
  * Scale posture: inference + stats are TWO distributed passes over the
  * file (one schema vote, one stats aggregate) — no collect of data rows;
  * a 10 TB CSV infers from the same code path. NDV is exact here to match
  * the reference's DESCRIBE; `approxStats` trades it for HLL at scale.
  */
object CsvInference {

  case class ColumnMeta(name: String, typeName: String, ndv: Long,
    min: String, max: String)
  case class TableMeta(name: String, rowCount: Long, columns: Seq[ColumnMeta])

  private val DateLo = 19000000L
  private val DateHi = 21000000L

  /** Per-column conformance votes, computed in one aggregate pass. */
  private case class Vote(dateOk: Boolean, intOk: Boolean, doubleOk: Boolean)

  /** Infer the reference type for each column of an all-string frame. */
  private def votes(raw: DataFrame): Map[String, Vote] = {
    val aggs: Seq[Column] = raw.columns.flatMap { c =>
      val v = col(c)
      val asD = expr(s"try_cast(`$c` as double)")
      // Strict boolean vote: a null/empty cell or an 8-char cell that fails
      // the bigint parse must veto DATE32 (reference csv_loader.cpp:49-66
      // throws on stoi / size != 8 → column flips to STRING). Without the
      // coalesce, the vote is NULL for those cells and min() skips them.
      val dateOk = v.isNotNull && (length(v) === 8) &&
        coalesce(expr(s"try_cast(`$c` as bigint)").between(DateLo, DateHi), lit(false))
      // "parses as a double that is integral and in i64 range"
      val intOk = asD.isNotNull && (asD === expr("floor(" + s"try_cast(`$c` as double)" + ")")) &&
        abs(asD) <= lit(9.223372036854775E18)
      val doubleOk = asD.isNotNull
      Seq(
        min(dateOk.cast("int")).as(s"${c}__date"),
        min(intOk.cast("int")).as(s"${c}__int"),
        min(doubleOk.cast("int")).as(s"${c}__double"))
    }.toSeq
    val row = raw.agg(aggs.head, aggs.tail: _*).head()
    raw.columns.map { c =>
      def ok(kind: String): Boolean = {
        val i = row.fieldIndex(s"${c}__$kind")
        !row.isNullAt(i) && row.getInt(i) == 1
      }
      c -> Vote(ok("date"), ok("int"), ok("double"))
    }.toMap
  }

  /** Load a CSV with header, applying the inference rules, and compute
    * table statistics. Returns the typed frame and its metadata.
    *
    * Ragged rows (cell count ≠ header count) REJECT the whole file, like
    * the reference's loader (csv_loader.cpp:34-36 throws "Row size
    * mismatch"); Spark's default PERMISSIVE mode would instead silently
    * null-pad short rows / drop extra cells — an undocumented divergence
    * until round 3. FAILFAST surfaces the malformed row at the first
    * action (the inference vote pass), which we rethrow under the
    * reference's message.
    */
  def load(spark: SparkSession, path: String, tableName: String): (DataFrame, TableMeta) = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)
    try typed(raw, tableName)
    catch {
      case e: Throwable if isMalformedRow(e) =>
        throw new IllegalArgumentException("Row size mismatch", e)
    }
  }

  /** Spark reports FAILFAST rejections as a SparkException chain with a
    * BadRecordException / MALFORMED_RECORD cause; walk it.
    */
  private def isMalformedRow(e: Throwable): Boolean = {
    var cur = e
    var depth = 0
    while (cur != null && depth < 16) {
      val s = cur.getClass.getName + ": " + String.valueOf(cur.getMessage)
      if (s.contains("BadRecord") || s.contains("MALFORMED_RECORD") ||
        s.contains("Malformed")) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** Same, for a frame already read as all-strings (e.g. stdin). */
  def typed(raw: DataFrame, tableName: String): (DataFrame, TableMeta) = {
    // zero-column input (empty stdin, headerless file) previously crashed
    // on aggs.head inside the vote pass — degrade to an empty table
    if (raw.columns.isEmpty)
      return (raw, TableMeta(tableName, 0L, Seq.empty))
    val vote = votes(raw)
    val cols = raw.columns.map { c =>
      val v = vote(c)
      if (v.dateOk) col(c).cast("int").as(c) // yyyymmdd DATE32 (SURVEY §7.5.2)
      else if (v.intOk) expr(s"cast(try_cast(`$c` as double) as bigint)").as(c)
      else if (v.doubleOk) col(c).cast("double").as(c)
      else col(c)
    }
    val typedDf = raw.select(cols.toIndexedSeq: _*)
    val meta = statsFor(typedDf, tableName)
    // DATE32 columns are IntegerType in the frame (SURVEY §7.5.2), but
    // DESCRIBE must present them as the reference's DATE32, not INT64 —
    // record the inference outcome in the metadata.
    (typedDf, meta.copy(columns = meta.columns.map { c =>
      if (vote(c.name).dateOk) c.copy(typeName = "date32") else c
    }))
  }

  /** One distributed pass for the reference's DESCRIBE stats
    * (csv_loader.cpp:73-159): exact NDV + typed min/max + row count.
    * Works on any already-typed frame (CSV-inferred, parquet, JSON).
    * At 100 TB, swap countDistinct for approx_count_distinct.
    */
  def statsFor(typedDf: DataFrame, tableName: String): TableMeta = {
    val statAggs: Seq[Column] = count(lit(1)).as("__rows") +: typedDf.columns.flatMap { c =>
      Seq(
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }.toSeq
    val s = typedDf.agg(statAggs.head, statAggs.tail: _*).head()
    val metas = typedDf.schema.fields.map { f =>
      ColumnMeta(f.name, f.dataType.simpleString,
        s.getAs[Long](s"${f.name}__ndv"),
        Option(s.getAs[String](s"${f.name}__min")).getOrElse(""),
        Option(s.getAs[String](s"${f.name}__max")).getOrElse(""))
    }
    TableMeta(tableName, s.getAs[Long]("__rows"), metas.toIndexedSeq)
  }
}
