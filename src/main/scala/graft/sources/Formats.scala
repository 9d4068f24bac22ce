package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{Tables, WorkDirs}

/** Source/sink formats and write-time data layouts.
  *
  * The reference engine's only I/O is a CSV load into memory
  * (/root/reference/src/storage/csv_loader.cpp) — covered by
  * [[graft.catalog.CsvInference]] and the CLI. This object adds what a
  * Spark-native engine needs at 100 TB, where the WRITE layout decides
  * every later read's cost:
  *
  *  - JSONL round-trip — the interchange format training corpora
  *    actually arrive in. The query proves byte-exact text fidelity
  *    through the sink+source pair (md5 extrema per group), not just
  *    row counts.
  *  - Hive-partitioned parquet — `partitionBy(lang)` at write time turns
  *    a language filter into directory pruning: a 2-language read of a
  *    50-language corpus opens 4% of the files, before any row is
  *    decoded. The pruning is pinned in PlanSpec (PartitionFilters).
  *  - Range-sorted parquet — `repartitionByRange(ts) +
  *    sortWithinPartitions(ts)` gives every file a tight min/max ts
  *    envelope, so a time-window read skips whole files/row-groups on
  *    parquet statistics alone — the layout under every time-series
  *    store. (Same idea as the reference's unused per-column min/max
  *    stats, catalog.h:16-43 — here they actually prune.)
  *
  * Each operator is graded end-to-end: write the layout, read it back
  * through the pruned path, aggregate, and hash-match a DuckDB oracle
  * computed straight from the canonical parquet. Materializations live
  * under per-process scratch roots ([[WorkDirs]]).
  */
object Formats {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private def out(kind: String, dir: String): String =
    s"${WorkDirs.processScoped("graft_formats")}/${kind}_${WorkDirs.tag64(dir)}"

  // ------------------------------------------------------ JSONL roundtrip
  /** Write documents as JSONL, read them back with an explicit schema
    * (schema inference over 100 TB of JSON is a full extra pass — never
    * at scale), and aggregate per language: counts, total lengths, and
    * the min/max text md5. The digests make the check strict: any
    * mangled byte in any document flips a group's extrema and the hash
    * match fails — this grades the sink+source PAIR, not the aggregate.
    */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = out("jsonl_docs", dir)
    docs(spark, dir).write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.read.schema(schema).json(path)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_len"),
        sum(col("n_chars")).as("sum_chars"),
        min(md5(col("text").cast("binary"))).as("min_md5"),
        max(md5(col("text").cast("binary"))).as("max_md5"))
      .orderBy(col("lang"))
  }

  val jsonlRoundtripSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_len,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------- ORC roundtrip
  /** The same fidelity contract through the ORC sink+source (Spark's
    * second first-class columnar format — predicate pushdown and column
    * pruning work the same as parquet). Grouped by source so the check
    * exercises a different grouping than the JSONL twin.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = out("orc_docs", dir)
    docs(spark, dir).write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_len"),
        min(md5(col("text").cast("binary"))).as("min_md5"),
        max(md5(col("text").cast("binary"))).as("max_md5"))
      .orderBy(col("source"))
  }

  val orcRoundtripSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_len,
      |  MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------- partitioned layout
  /** Hive-partitioned write + pruned read: documents land under
    * lang=<v>/ directories; the read-back filters two languages and
    * aggregates per (lang, source). At scale the filter never touches
    * the other partitions' files — directory-level pruning, visible in
    * the scan's PartitionFilters (pinned in PlanSpec).
    */
  def partitionedPrune(spark: SparkSession, dir: String): DataFrame = {
    val path = out("part_docs", dir)
    docs(spark, dir).write.mode("overwrite").partitionBy("lang").parquet(path)
    partitionedReadback(spark, path)
  }

  /** The pruned read side, split out so PlanSpec can inspect its plan. */
  def partitionedReadback(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("lang").isin("en", "fr"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("lang"), col("source"))

  val partitionedPruneSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(doc_id) AS min_doc
      |FROM documents WHERE lang IN ('en', 'fr')
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ------------------------------------------------- range-sorted layout
  /** Range-partitioned, sorted event layout + time-window read: events
    * are written range-partitioned and sorted by ts, so each parquet
    * file covers a disjoint tight time span; the 10-day window read
    * then skips most files on their min/max statistics without decoding
    * a row. The aggregation itself matches the canonical table — layout
    * must never change results, only cost.
    */
  def rangeLayout(spark: SparkSession, dir: String): DataFrame = {
    val path = out("range_events", dir)
    Tables.load(spark, dir, "events")
      .repartitionByRange(8, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-20").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  val rangeLayoutSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------- Z-order layout
  /** Z-order (Morton-curve) layout: interleave the bits of (user bucket,
    * day index) into one sort key, range-partition + sort the write by
    * it, and every file gets a tight min/max envelope on BOTH columns —
    * so a read filtering either (or both) dimensions skips files on
    * parquet footer stats. Plain sort-by-user clusters user but
    * scatters time (and vice versa); the space-filling curve is the
    * standard multi-dimension data-skipping layout (Delta/Iceberg
    * OPTIMIZE ZORDER — here as ~15 lines of column algebra). The
    * read-back applies a predicate on each dimension and must match the
    * canonical table exactly: layout changes cost, never results.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val path = out("zorder_events", dir)
    // 8-bit dimensions: user_id mod 256, day-of-month index. The bit
    // interleave is pure codegen'd integer algebra (shiftleft/|).
    val u = col("user_id") % 256
    val d = dayofmonth(col("ts")).cast("long") % 256
    val z = (0 until 8).map(i =>
      (shiftleft(shiftright(u, i) % 2, 2 * i) +
        shiftleft(shiftright(d, i) % 2, 2 * i + 1)): Column)
      .reduce(_ + _)
    Tables.load(spark, dir, "events")
      .withColumn("zval", z)
      .repartitionByRange(8, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .filter(col("user_id") % 256 < 32 &&
        dayofmonth(col("ts")) >= 10 && dayofmonth(col("ts")) < 20)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  val zorderLayoutSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE user_id % 256 < 32
      |  AND CAST(date_part('day', ts) AS BIGINT) >= 10
      |  AND CAST(date_part('day', ts) AS BIGINT) < 20
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------- Hilbert layout
  /** Hilbert-curve layout — [[zorderLayout]]'s sibling with strictly
    * better locality: Morton order takes "seam jumps" (bit-carry
    * discontinuities) that stretch a file's min/max envelope across the
    * grid, while every Hilbert step is a unit move, so contiguous curve
    * ranges are compact blobs and 2-dim probes skip more files
    * (Delta/Iceberg OPTIMIZE exposes exactly this Z-order/Hilbert
    * switch). Same dimensions as zorder (user bucket × day-of-month).
    *
    * Scale posture: the curve index lives on the BOUNDED 256×32 bucket
    * grid, so it is a driver-computed broadcast LOOKUP (8k rows of pure
    * Scala bit algebra) rather than per-row unrolled bit expressions —
    * per-row cost is one broadcast-hash probe, and the lookup table
    * never grows with data. The read-back applies predicates on both
    * dimensions and must match the canonical table exactly: layout
    * changes cost, never results. SourcesSpec additionally measures the
    * file-envelope pruning: a day-band probe intersects FEWER Hilbert
    * files than 1-dim user-sorted files.
    */
  def hilbertLayout(spark: SparkSession, dir: String): DataFrame = {
    val path = out("hilbert_events", dir)
    hilbertWrite(spark, dir, path)
    spark.read.parquet(path)
      .filter(col("user_id") % 256 >= 64 && col("user_id") % 256 < 96 &&
        dayofmonth(col("ts")) >= 10 && dayofmonth(col("ts")) < 20)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** The layout write itself (factored so the spec lays out its own
    * temp copies for the pruning comparison).
    */
  def hilbertWrite(spark: SparkSession, dir: String, path: String): Unit = {
    import spark.implicits._
    val lut = (for (u <- 0 until 256; d <- 0 until 32)
      yield (u.toLong, d.toLong, hilbertXy2d(256, u, d)))
      .toDF("hu", "hd", "hval")
    Tables.load(spark, dir, "events")
      .withColumn("hu", col("user_id") % 256)
      .withColumn("hd", dayofmonth(col("ts")).cast("long") % 32)
      .join(broadcast(lut), Seq("hu", "hd"))
      .repartitionByRange(8, col("hval"))
      .sortWithinPartitions(col("hval"))
      .drop("hu", "hd", "hval")
      .write.mode("overwrite").parquet(path)
  }

  /** xy→d on an n×n grid (n a power of two): the classic iterative
    * rotate-and-accumulate walk (public-domain formulation, Wikipedia
    * "Hilbert curve"). Runs driver-side over the bounded bucket grid
    * only — never per data row.
    */
  def hilbertXy2d(n: Int, x0: Int, y0: Int): Long = {
    var x = x0; var y = y0; var d = 0L; var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the sub-curve re-anchors
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  val hilbertLayoutSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE user_id % 256 >= 64 AND user_id % 256 < 96
      |  AND CAST(date_part('day', ts) AS BIGINT) >= 10
      |  AND CAST(date_part('day', ts) AS BIGINT) < 20
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------- compaction
  /** Small-file compaction — the table-maintenance pass every streaming
    * or per-partition ingest eventually needs: a directory fragmented
    * into many tiny files (here: a deliberate 64-way fragmented write)
    * is rewritten into ceil(totalBytes / targetBytes) right-sized files.
    * Small files are the classic lakehouse tax — per-file open/footer
    * costs dominate scans, and a 100 TB table ingested in 10k
    * micro-batches can carry millions of them; Delta/Iceberg OPTIMIZE
    * is this exact rewrite. Sizing uses the Hadoop FileSystem API (works
    * on object stores, not just local disk — ADVICE r5). The graded
    * read-back proves compaction is content-neutral: byte-exact global
    * md5 extrema, not just counts.
    */
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    val frag = out("frag_docs", dir)
    val comp = out("compact_docs", dir)
    docs(spark, dir).repartition(64).write.mode("overwrite").parquet(frag)
    compactTo(spark, frag, comp, targetBytes = 4L << 20)
    spark.read.parquet(comp)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(md5(col("text").cast("binary"))).as("min_md5"),
        max(md5(col("text").cast("binary"))).as("max_md5"))
  }

  /** The rewrite itself: list data files, size the output file count from
    * the actual bytes, one repartition write. Returns the file count so
    * callers/tests can assert the layout effect.
    */
  def compactTo(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  val compactionSql: String =
    """SELECT COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5
      |FROM documents""".stripMargin

  // ---------------------------------------------------- snapshots
  /** Versioned snapshot store + time travel ([[graft.engine.Snapshots]]):
    * v0 initial load, v1 append of late-arriving keys, v2 a
    * delete-rewrite (replace commit) — then every version is read BACK
    * and summarized, so the grade covers init/append/replace commits AND
    * historical reads after the table moved on (v0/v1 must still
    * reproduce exactly after v2 replaced the file list). The oracle
    * rebuilds each version's state as set algebra over the canonical
    * table.
    */
  /** Fresh (deleted-if-present) scratch path — snapshot fixtures rebuild
    * per invocation so re-entrant callers (bench warmups, the hygiene
    * spec's double pass) never trip errorifexists.
    */
  private def fresh(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(p)) fsys.delete(p, true)
    path
  }

  /** Shared 3-version orders lifecycle (init / append / delete-rewrite)
    * under `table` — the fixture both [[timeTravel]] and [[versionDiff]]
    * grade against.
    */
  private def ordersV012(spark: SparkSession, dir: String, table: String): Unit = {
    import graft.engine.Snapshots
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false)
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 1), table, append = true)
    val v1 = Snapshots.read(spark, table, 1)
    Snapshots.commit(v1.filter(col("o_orderkey") % 5 =!= 0), table, append = false)
  }

  // --------------------------------------------------- shallow clone
  /** Shallow clone + tag lifecycle, graded end to end
    * ([[graft.engine.Snapshots.cloneTable]] / `.tag`): the parent table
    * builds v0 (keys ≡ 0 mod 3) and v1 (+ keys ≡ 1 mod 3); the clone
    * forks at v0 ZERO-COPY (its manifest references the parent's batch
    * by absolute path), then diverges with its own append (keys ≡ 2
    * mod 3 — rows the parent never sees); a tag pins the clone's fork
    * state. Four summarized states prove the isolation contract:
    * parent@latest (0∪1), clone@latest (0∪2), clone@tag (= parent@v0 —
    * the zero-copy reference and the tag resolution), parent@v0
    * (unchanged by everything the clone did). The oracle recomputes all
    * four from the key-residue algebra — any cross-contamination
    * (a clone commit leaking into the parent, a fork seeing post-fork
    * parent data) breaks the hash.
    */
  def shallowClone(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val parent = fresh(spark, out("snapclone_src", dir))
    val clone = fresh(spark, out("snapclone_dst", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), parent, append = false)
    Snapshots.cloneTable(spark, parent, clone, version = 0)
    Snapshots.tag(spark, clone, "fork-point", version = 0)
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 1), parent, append = true)
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 2), clone, append = true)
    def summary(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
        .select(lit(label).as("state"), col("n_rows"), col("sum_price"),
          col("min_key"), col("max_key"))
    summary("clone_at_tag", Snapshots.readTagged(spark, clone, "fork-point"))
      .unionByName(summary("clone_latest", Snapshots.read(spark, clone)))
      .unionByName(summary("parent_latest", Snapshots.read(spark, parent)))
      .unionByName(summary("parent_v0", Snapshots.read(spark, parent, 0)))
      .orderBy(col("state"))
  }

  val shallowCloneSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |r0 AS (SELECT * FROM o WHERE o_orderkey % 3 = 0),
      |r01 AS (SELECT * FROM o WHERE o_orderkey % 3 IN (0, 1)),
      |r02 AS (SELECT * FROM o WHERE o_orderkey % 3 IN (0, 2)),
      |s AS (
      |  SELECT 'clone_at_tag' AS state, COUNT(*) AS n_rows,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |    MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key FROM r0
      |  UNION ALL
      |  SELECT 'clone_latest', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |    MIN(o_orderkey), MAX(o_orderkey) FROM r02
      |  UNION ALL
      |  SELECT 'parent_latest', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |    MIN(o_orderkey), MAX(o_orderkey) FROM r01
      |  UNION ALL
      |  SELECT 'parent_v0', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |    MIN(o_orderkey), MAX(o_orderkey) FROM r0)
      |SELECT * FROM s ORDER BY state""".stripMargin

  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snap_orders", dir))
    ordersV012(spark, dir, table)
    (0 to 2).map { v =>
      Snapshots.read(spark, table, v).agg(
        count(lit(1)).as("n_rows"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_price"),
          col("min_key"), col("max_key"))
    }.reduce(_.unionByName(_)).orderBy(col("version"))
  }

  /** Additive SCHEMA EVOLUTION lifecycle: v0 commits the narrow orders
    * projection; v1 appends rows that also carry a NEW column
    * (`o_tier`); reading the latest with mergeSchema widens to the
    * union, and pre-evolution rows surface the new column as NULL —
    * Delta's default additive-evolution allowance, the one schema
    * change a 100 TB table can absorb without rewriting a byte. The
    * graded frame summarizes the merged read split by origin (legacy =
    * tier-less rows), so the grade pins the union schema, the NULL
    * back-fill, and that typed aggregation over the evolved column
    * still works across mixed batches.
    */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapevo_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false)
    Snapshots.commit(
      o.filter(col("o_orderkey") % 3 === 1)
        .withColumn("o_tier", (col("o_orderkey") % 4).cast("long")),
      table, append = true)
    Snapshots.read(spark, table, mergeSchema = true)
      .groupBy(col("o_tier").isNull.cast("long").as("legacy"))
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("o_totalprice")).as("sum_price"),
        sum(coalesce(col("o_tier"), lit(0L))).as("sum_tier"))
      .orderBy(col("legacy"))
  }

  /** RENAME COLUMN lifecycle ([[graft.engine.Snapshots.renameColumn]] —
    * Delta column-mapping semantics, zero bytes rewritten): v0 commits
    * orders under the physical name `o_totalprice`; v1 renames it to
    * `price_usd` as a pure-metadata commit; v2 appends rows already
    * carrying the logical name. The graded read proves old and new
    * batches unify under the logical name (per-origin split, typed
    * aggregation across mixed-era batches), and the in-query requires
    * pin the metadata physics: the latest schema speaks ONLY the new
    * name while time travel to v0 still reads the old one.
    */
  def renameColumn(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snaprename_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), table,
      append = false)
    Snapshots.renameColumn(spark, table, "o_totalprice", "price_usd")
    Snapshots.commit(
      o.filter(col("o_orderkey") % 3 === 1)
        .withColumnRenamed("o_totalprice", "price_usd"),
      table, append = true)
    val latest = Snapshots.read(spark, table)
    require(latest.columns.contains("price_usd") &&
      !latest.columns.contains("o_totalprice"),
      "latest must speak only the logical name")
    require(Snapshots.read(spark, table, 0).columns.contains("o_totalprice"),
      "time travel before the rename must keep the physical name")
    latest
      .groupBy((col("o_orderkey") % 3).cast("long").as("origin"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("price_usd")).as("sum_price"))
      .orderBy(col("origin"))
  }

  val renameColumnSql: String =
    """SELECT CAST(o_orderkey % 3 AS BIGINT) AS origin, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderkey % 3 IN (0, 1)
      |GROUP BY 1 ORDER BY origin""".stripMargin

  /** EXACTLY-ONCE streaming ingest ledger ([[graft.engine.Snapshots
    * .commitWithTxn]], Delta's txn-appId pattern) graded end to end:
    * two micro-batches commit under one appId with a REPLAY of each
    * injected (foreachBatch is at-least-once — a crash between the sink
    * write and the checkpoint commit re-runs the batch with the same
    * id). Both replays must be no-ops: no version published, no staged
    * garbage visible, row counts exact — the property that lets a
    * 100 TB ingest stream restart anywhere without double-counting a
    * row. The graded row carries the surviving aggregate plus the
    * commit/replay census (requires pin the ledger behavior). The
    * STREAMING twin is [[graft.streaming.SnapshotIngest]] (the
    * production foreachBatch sink over the same ledger); StreamingSpec
    * grades crash + restart AND byte-identical state under both replay
    * classes (immediate duplicate, stale replay after later progress).
    */
  def exactlyOnceQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snaptxn_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    def batch(m: Int) = o.filter(col("o_orderkey") % 3 === m)
    require(Snapshots.commitWithTxn(batch(0), table, "ingest", 0L).contains(0),
      "first micro-batch must publish v0")
    require(Snapshots.commitWithTxn(batch(0), table, "ingest", 0L).isEmpty,
      "replaying batch 0 must be a no-op")
    require(Snapshots.commitWithTxn(batch(1), table, "ingest", 1L).contains(1),
      "second micro-batch must publish v1")
    require(Snapshots.commitWithTxn(batch(1), table, "ingest", 0L).isEmpty,
      "a stale replay after later progress must be a no-op")
    require(Snapshots.versions(spark, table) == Seq(0, 1),
      "replays must publish no versions")
    Snapshots.read(spark, table)
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
      .select(col("n_rows"), col("sum_price"),
        lit(2L).as("n_commits"), lit(2L).as("n_replays_skipped"))
  }

  val exactlyOnceSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(2 AS BIGINT) AS n_commits, CAST(2 AS BIGINT) AS n_replays_skipped
      |FROM orders WHERE o_orderkey % 3 IN (0, 1)""".stripMargin

  /** CHECK-constraint ingest gate ([[graft.engine.Snapshots
    * .commitChecked]], Delta table constraints / DLT expectations)
    * graded end to end: a clean batch commits under
    * `CHECK (o_totalprice > 0)`, then a batch carrying one poisoned row
    * must abort ATOMICALLY — no version published, no partial data
    * visible, the table still reads exactly the clean commit. That
    * atomicity is the whole point of an ingest-time gate at 100 TB: a
    * post-hoc quality scan leaves the bad rows readable until someone
    * reacts; the gate means downstream never sees them. The graded row
    * carries the surviving table's aggregate plus the rejection and
    * version census (requires pin the abort happened and published
    * nothing).
    */
  def checkConstraintQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    import spark.implicits._
    val table = fresh(spark, out("snapcheck_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val gate = col("o_totalprice") > 0.0
    Snapshots.commitChecked(o.filter(col("o_orderkey") % 3 === 0), table,
      append = false, constraint = gate)
    val dirty = o.filter(col("o_orderkey") % 3 === 1)
      .unionByName(Seq((-1L, -5.0)).toDF("o_orderkey", "o_totalprice"))
    val rejected = try {
      Snapshots.commitChecked(dirty, table, append = true, constraint = gate)
      0L
    } catch { case _: IllegalArgumentException => 1L }
    require(rejected == 1L, "the poisoned batch must be rejected")
    require(Snapshots.versions(spark, table) == Seq(0),
      "a rejected commit must publish no version")
    Snapshots.read(spark, table)
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"))
      .select(col("n_rows"), col("sum_price"),
        lit(rejected).as("dirty_rejected"), lit(1L).as("n_versions"))
  }

  val checkConstraintSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(1 AS BIGINT) AS dirty_rejected, CAST(1 AS BIGINT) AS n_versions
      |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin

  /** DROP COLUMN lifecycle ([[graft.engine.Snapshots.dropColumn]])
    * graded end to end: commit orders WITH a tier column, drop it
    * (metadata-only), then append a batch REUSING the name — a fresh
    * column under Delta drop semantics. The graded aggregate proves the
    * three contracts at once: pre-drop rows read the reused column as
    * NULL (sum_tier counts only post-drop values — resurrection of the
    * old physical values would inflate it), the post-drop pre-append
    * read carries no such column at all, and time travel before the
    * drop still reads the original values (both pinned by requires; the
    * v0 sum rides a third output column).
    */
  def dropColumnQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapdrop_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("o_orderkey") % 4).cast("long").as("o_tier"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), table,
      append = false)
    Snapshots.dropColumn(spark, table, "o_tier")
    require(!Snapshots.read(spark, table).columns.contains("o_tier"),
      "post-drop read must not carry the column")
    // append REUSING the dropped name: a FRESH column
    Snapshots.commit(
      o.filter(col("o_orderkey") % 3 === 1)
        .withColumn("o_tier", (col("o_orderkey") % 7).cast("long")),
      table, append = true)
    val v0 = Snapshots.read(spark, table, 0)
    require(v0.columns.contains("o_tier"),
      "time travel before the drop must keep the column")
    val latest = Snapshots.read(spark, table, mergeSchema = true)
    latest
      .groupBy((col("o_orderkey") % 3).cast("long").as("origin"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_price"),
        sum(coalesce(col("o_tier"), lit(0L))).as("sum_tier"),
        sum(col("o_tier").isNull.cast("long")).as("n_null_tier"))
      .orderBy(col("origin"))
  }

  val dropColumnSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v0 AS (SELECT o_orderkey, o_totalprice, CAST(NULL AS BIGINT) AS o_tier
      |       FROM o WHERE o_orderkey % 3 = 0),
      |v2 AS (SELECT o_orderkey, o_totalprice, CAST(o_orderkey % 7 AS BIGINT) AS o_tier
      |       FROM o WHERE o_orderkey % 3 = 1),
      |u AS (SELECT * FROM v0 UNION ALL SELECT * FROM v2)
      |SELECT CAST(o_orderkey % 3 AS BIGINT) AS origin, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(COALESCE(o_tier, 0)) AS BIGINT) AS sum_tier,
      |  CAST(SUM(CASE WHEN o_tier IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_tier
      |FROM u GROUP BY 1 ORDER BY origin""".stripMargin

  val schemaEvolutionSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v0 AS (SELECT o_orderkey, o_totalprice, CAST(NULL AS BIGINT) AS o_tier
      |       FROM o WHERE o_orderkey % 3 = 0),
      |v1 AS (SELECT o_orderkey, o_totalprice, CAST(o_orderkey % 4 AS BIGINT) AS o_tier
      |       FROM o WHERE o_orderkey % 3 = 1),
      |u AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1)
      |SELECT CAST(CASE WHEN o_tier IS NULL THEN 1 ELSE 0 END AS BIGINT) AS legacy,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  CAST(SUM(COALESCE(o_tier, 0)) AS BIGINT) AS sum_tier
      |FROM u GROUP BY 1 ORDER BY legacy""".stripMargin

  /** VACUUM lifecycle ([[graft.engine.Snapshots.vacuum]]) graded end to
    * end: the shared v0/v1/v2 orders lifecycle, an orphan batch dir
    * planted as an aborted-commit leftover, then `vacuum(keepVersions=1)`.
    * The graded row proves the two contracts at once: the retained
    * version reads back EXACTLY from the surviving files (summary
    * columns — v0/v1's batches and the orphan are gone from disk when
    * this read runs), and the physical census matches the lifecycle's
    * construction (3 commits → one batch dir each, v2's replace is the
    * only live one, plus the orphan → removed=3/live=1, deterministic
    * by construction, not by layout luck). The deeper physics —
    * pre-retention reads die, replays are no-ops, clone parents
    * survive a clone's vacuum — is pinned in SnapshotsSpec.
    */
  def vacuumQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapvac_orders", dir))
    ordersV012(spark, dir, table)
    val orphan = new org.apache.hadoop.fs.Path(s"$table/data/batch-9-orphan")
    orphan.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(orphan)
    // the planted orphan is seconds old; production leaves the default
    // 1h grace so a live writer's staging survives — the fixture
    // force-expires it (same convention as SnapshotsSpec's keepFrom tests)
    val (removed, live) =
      Snapshots.vacuum(spark, table, keepVersions = 1, orphanGraceMs = -1000)
    Snapshots.read(spark, table, 2).agg(
        count(lit(1)).as("n_rows"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .select(lit(2L).as("version"), col("n_rows"), col("sum_price"),
        col("min_key"), col("max_key"),
        lit(removed.toLong).as("n_removed"), lit(live.toLong).as("n_live"))
  }

  val vacuumSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v1 AS (SELECT * FROM o WHERE o_orderkey % 3 IN (0, 1)),
      |v2 AS (SELECT * FROM v1 WHERE o_orderkey % 5 <> 0)
      |SELECT CAST(2 AS BIGINT) AS version, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
      |  CAST(3 AS BIGINT) AS n_removed, CAST(1 AS BIGINT) AS n_live
      |FROM v2""".stripMargin

  val timeTravelSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v0 AS (SELECT * FROM o WHERE o_orderkey % 3 = 0),
      |v1 AS (SELECT * FROM o WHERE o_orderkey % 3 IN (0, 1)),
      |v2 AS (SELECT * FROM v1 WHERE o_orderkey % 5 <> 0)
      |SELECT 0 AS version, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key FROM v0
      |UNION ALL
      |SELECT 1, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |  MIN(o_orderkey), MAX(o_orderkey) FROM v1
      |UNION ALL
      |SELECT 2, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |  MIN(o_orderkey), MAX(o_orderkey) FROM v2
      |ORDER BY version""".stripMargin

  // ----------------------------------------------------------- restore
  /** RESTORE lifecycle ([[graft.engine.Snapshots.restore]]), graded end
    * to end: the shared v0/v1/v2 orders lifecycle ends in a replace (v2 =
    * v1 minus every 5th key — the "bad replace" to undo); v3 RESTOREs to
    * v1 as a metadata-only commit; v4 appends on top of the restored
    * state (keys ≡ 2 mod 3). Three summarized states prove the contract:
    * `restored` (v3 ≡ v1 — the rewind re-references v1's batches,
    * nothing copied), `after_append` (v4 = v1 ∪ the new keys — the table
    * lives on from the restored state), and `pre_restore` (v2 read back
    * unchanged — restore adds history, never rewrites it). The oracle
    * recomputes all three from key-residue algebra.
    */
  def restoreVersion(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snaprestore_orders", dir))
    ordersV012(spark, dir, table)
    Snapshots.restore(spark, table, 1)
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 2), table, append = true)
    def summary(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
        .select(lit(label).as("state"), col("n_rows"), col("sum_price"),
          col("min_key"), col("max_key"))
    summary("after_append", Snapshots.read(spark, table, 4))
      .unionByName(summary("pre_restore", Snapshots.read(spark, table, 2)))
      .unionByName(summary("restored", Snapshots.read(spark, table, 3)))
      .orderBy(col("state"))
  }

  val restoreVersionSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v1 AS (SELECT * FROM o WHERE o_orderkey % 3 IN (0, 1)),
      |v2 AS (SELECT * FROM v1 WHERE o_orderkey % 5 <> 0),
      |v4 AS (SELECT * FROM v1 UNION ALL SELECT * FROM o WHERE o_orderkey % 3 = 2),
      |s AS (
      |  SELECT 'after_append' AS state, COUNT(*) AS n_rows,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |    MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key FROM v4
      |  UNION ALL
      |  SELECT 'pre_restore', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |    MIN(o_orderkey), MAX(o_orderkey) FROM v2
      |  UNION ALL
      |  SELECT 'restored', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |    MIN(o_orderkey), MAX(o_orderkey) FROM v1)
      |SELECT * FROM s ORDER BY state""".stripMargin

  // ------------------------------------------------- row-level deletes
  /** Row-level deletes via deletion files ([[graft.engine.Snapshots
    * .deleteRows]]): v0 loads orders, v1 is a METADATA-ONLY delete of
    * every 7th key (the data batch is untouched — a 100 TB GDPR delete
    * at the cost of writing the key list), v2 folds the delete into a
    * compacted rewrite ([[graft.engine.Snapshots.compactDeletes]]). All
    * three versions are read back and summarized: v0 must still show the
    * deleted rows (time travel under deletes), v1 grades the read-side
    * anti-join, v2 grades that folding is content-neutral (identical
    * summary to v1 by construction — the oracle computes it
    * independently for both).
    */
  def deleteRead(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapdel_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o, table, append = false)
    Snapshots.deleteRows(
      o.filter(col("o_orderkey") % 7 === 0).select(col("o_orderkey")),
      table, "o_orderkey")
    Snapshots.compactDeletes(spark, table)
    (0 to 2).map { v =>
      Snapshots.read(spark, table, v).agg(
        count(lit(1)).as("n_rows"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_price"),
          col("min_key"), col("max_key"))
    }.reduce(_.unionByName(_)).orderBy(col("version"))
  }

  val deleteReadSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |d AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0)
      |SELECT 0 AS version, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key FROM o
      |UNION ALL
      |SELECT 1, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |  MIN(o_orderkey), MAX(o_orderkey) FROM d
      |UNION ALL
      |SELECT 2, COUNT(*), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |  MIN(o_orderkey), MAX(o_orderkey) FROM d
      |ORDER BY version""".stripMargin

  /** Change-data feed over the snapshot store ([[graft.engine.Snapshots
    * .diff]]): the same init/append/delete-rewrite lifecycle as
    * [[timeTravel]], then the v0→v1 and v1→v2 deltas — the incremental
    * path a downstream consumer reads instead of re-scanning the table.
    * The graded output aggregates each transition's change rows; the
    * oracle derives the same deltas as set algebra (v0→v1 must be pure
    * inserts of the appended keys, v1→v2 pure deletes of the rewritten
    * ones).
    */
  def versionDiff(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapdiff_orders", dir))
    ordersV012(spark, dir, table)
    def summarize(tag: String, vFrom: Int, vTo: Int): DataFrame =
      Snapshots.diff(spark, table, vFrom, vTo)
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          dsum(col("o_totalprice")).as("sum_price"))
        .select(lit(tag).as("transition"), col("change_type"), col("n_rows"),
          col("min_key"), col("max_key"), col("sum_price"))
    summarize("v0_v1", 0, 1).unionByName(summarize("v1_v2", 1, 2))
      .orderBy(col("transition"), col("change_type"))
  }

  val versionDiffSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders)
      |SELECT 'v0_v1' AS transition, 'insert' AS change_type, COUNT(*) AS n_rows,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM o WHERE o_orderkey % 3 = 1
      |UNION ALL
      |SELECT 'v1_v2', 'delete', COUNT(*),
      |  MIN(o_orderkey), MAX(o_orderkey),
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      |FROM o WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 5 = 0
      |ORDER BY transition, change_type""".stripMargin

  /** Manifest-stats file skipping over the snapshot store: three append
    * commits land disjoint event_id ranges, each manifest line recording
    * the batch's min/max envelope; the pruned read then resolves its
    * range against the MANIFEST alone — non-overlapping batch
    * directories are dropped before any parquet footer is opened
    * (directory-level skipping one level above row-group stats; the
    * Iceberg manifest trick). SnapshotsSpec pins the skip via
    * inputFiles; the graded result must equal the plain filter — layout
    * changes cost, never content. The driver-side max() scalar sizes
    * the ranges — a layout-build step (like Bucketing's write), not an
    * operator path.
    */
  def manifestPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapstat_events", dir))
    val e = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val mx = e.agg(max(col("event_id"))).head.getLong(0)
    val b = mx / 3
    val sc = Some("event_id")
    Snapshots.commit(e.filter(col("event_id") <= b), table, append = false, statsCol = sc)
    Snapshots.commit(e.filter(col("event_id") > b && col("event_id") <= 2 * b),
      table, append = true, statsCol = sc)
    Snapshots.commit(e.filter(col("event_id") > 2 * b), table, append = true, statsCol = sc)
    Snapshots.readPruned(spark, table, "event_id", 0L, b)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  val manifestPruneSql: String =
    """WITH mx AS (SELECT MAX(event_id) // 3 AS b FROM events)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events, mx WHERE event_id >= 0 AND event_id <= b
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DESCRIBE HISTORY over a full table lifecycle — init, append,
    * stream-txn append, row-level delete, OPTIMIZE fold — graded as
    * data: [[graft.engine.Snapshots.history]] reads the manifests alone
    * (no data file opened) and must report, per version, the commit
    * kind and exactly what it references (batches / pending delete
    * files / txn marks). The audit a governed table answers "who did
    * what, when" from; the VALUES oracle pins the whole ledger shape,
    * so any drift in commit bookkeeping (a kind mislabeled, a delete
    * line dropped on rebase, a txn mark lost through OPTIMIZE) breaks
    * the hash.
    */
  def historyAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snaphist_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false) // v0
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 1), table, append = true)  // v1
    Snapshots.commitWithTxn(o.filter(col("o_orderkey") % 3 === 2), table,
      appId = "hist-stream", batchId = 0L)                                         // v2
    Snapshots.deleteRows(
      o.filter(col("o_orderkey") % 5 === 0).select(col("o_orderkey")),
      table, "o_orderkey")                                                         // v3
    Snapshots.optimize(spark, table)                                               // v4
    Snapshots.history(spark, table)
  }

  val historyAuditSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS BIGINT), 'replace', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  (CAST(1 AS BIGINT), 'append',  CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
      |  (CAST(2 AS BIGINT), 'append',  CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
      |  (CAST(3 AS BIGINT), 'delete',  CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
      |  (CAST(4 AS BIGINT), 'optimize', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT))
      |) AS t(version, kind, n_batches, n_deletes, n_txns)
      |ORDER BY version""".stripMargin

  /** REPLACE WHERE as a metadata commit
    * ([[graft.engine.Snapshots.overwriteRange]]): the "reload one day
    * of a partitioned fact table" flow, graded end-to-end. Three
    * key-range batches land (low / mid / high thirds of event_id);
    * the overwrite then RELOADS the middle third with corrected values
    * (value doubled, the reload marker) without touching the neighbor
    * batches on disk — the fully-covered middle batch drops from the
    * manifest, the straddling neighbors (none here — ranges are
    * disjoint, so the masks are pure safety) gate at read time. A
    * fourth straddling overwrite then replaces a range CUTTING ACROSS
    * the remaining batches, exercising the mask path proper. The
    * graded aggregate must equal the oracle's recompute from the
    * residue algebra; time travel to v2 must still see the original
    * middle (pinned in SnapshotsSpec with the skip/mask accounting).
    */
  def replaceWhere(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snaprw_events", dir))
    val e = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val mx = e.agg(max(col("event_id"))).head.getLong(0)
    val b = mx / 3
    val sc = Some("event_id")
    Snapshots.commit(e.filter(col("event_id") <= b), table, append = false, statsCol = sc)
    Snapshots.commit(e.filter(col("event_id") > b && col("event_id") <= 2 * b),
      table, append = true, statsCol = sc)
    Snapshots.commit(e.filter(col("event_id") > 2 * b), table, append = true, statsCol = sc)
    // reload the middle third, values corrected (×2)
    Snapshots.overwriteRange(
      e.filter(col("event_id") > b && col("event_id") <= 2 * b)
        .withColumn("value", col("value") * 2),
      table, "event_id", b + 1, 2 * b, statsCol = sc)
    // straddling overwrite: a band cutting across the low and (new)
    // middle batches — the mask path proper
    Snapshots.overwriteRange(
      e.filter(col("event_id") > b / 2 && col("event_id") <= 3 * b / 2)
        .withColumn("value", col("value") * 3),
      table, "event_id", b / 2 + 1, 3 * b / 2, statsCol = sc)
    Snapshots.read(spark, table)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("event_type"))
  }

  val replaceWhereSql: String =
    """WITH mx AS (SELECT MAX(event_id) // 3 AS b FROM events),
      |v AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id > b // 2 AND event_id <= 3 * b // 2 THEN value * 3
      |         WHEN event_id > b AND event_id <= 2 * b THEN value * 2
      |         ELSE value END AS value
      |  FROM events, mx)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Manifest-BLOOM file skipping — the point-lookup complement of
    * [[manifestPrune]]'s range envelopes. Four append commits split
    * orders BY KEY HASH (o_orderkey % 4), so every batch spans the full
    * key range and min/max envelopes can never skip anything; each
    * commit also records a serialized bloom filter over o_orderkey in
    * its manifest line (built with Spark's distributed
    * `df.stat.bloomFilter` — partial blooms OR-merge, bit-identical on
    * any partitioning). The needle lookup of three keys, all ≡ 1 mod 4,
    * then resolves against the manifest alone: three batches' blooms
    * reject every key and only batch 1 (plus fpp-rate false positives)
    * is opened. SnapshotsSpec pins the skip via [[Snapshots.pointBatches]];
    * the graded result must equal the plain IN-filter — skipping changes
    * cost, never content (blooms have no false negatives). At 100 TB
    * this is the difference between a needle query opening one batch
    * and scanning the table.
    */
  def bloomSkipping(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapbloom_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val sc = Some("o_orderkey")
    (0 until 4).foreach { i =>
      Snapshots.commit(o.filter(col("o_orderkey") % 4 === i), table,
        append = i > 0, statsCol = sc, bloomFpp = 0.01)
    }
    // the probe keys — a layout-driven lookup set (like manifestPrune's
    // driver-side max()), not data riding the query plan
    val keys = o.filter(col("o_orderkey") % 4 === 1)
      .orderBy(col("o_orderkey")).limit(3)
      .collect().map(_.getLong(0)).toSeq
    Snapshots.readPoint(spark, table, "o_orderkey", keys)
      .orderBy(col("o_orderkey"))
  }

  val bloomSkippingSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE o_orderkey IN (
      |  SELECT o_orderkey FROM orders WHERE o_orderkey % 4 = 1
      |  ORDER BY o_orderkey LIMIT 3)
      |ORDER BY o_orderkey""".stripMargin

  /** Incremental view maintenance over the CDC feed: a per-status
    * aggregate MAINTAINED from the v0 aggregate plus the v0→v1 delta —
    * never recomputed from v1 — must equal the direct v1 recompute
    * (which is what the oracle runs). Works because COUNT and the
    * decimal SUM form an abelian group: inserts add, deletes subtract,
    * and exact decimal arithmetic makes maintenance bit-equal to
    * recomputation — the algebra every incremental materialized view
    * engine rests on (and why AVG/MIN/MAX need different treatment:
    * MIN/MAX aren't invertible under deletes). At scale the delta is
    * batch-sized while the recompute is table-sized; the maintained
    * aggregate touches only the delta and the old aggregate state.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapivm_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false)
    val v0 = Snapshots.read(spark, table, 0)
    Snapshots.commit(
      v0.filter(col("o_orderkey") % 5 =!= 0)
        .unionByName(o.filter(col("o_orderkey") % 3 === 1)),
      table, append = false)
    val dec = (c: Column) => c.cast(DecimalType(18, 4))
    val agg0 = v0.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n0"), sum(dec(col("o_totalprice"))).as("s0"))
    val delta = Snapshots.diff(spark, table, 0, 1)
      .withColumn("sgn", when(col("change_type") === "insert", 1L).otherwise(-1L))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("sgn")).as("dn"), sum(dec(col("o_totalprice")) * col("sgn")).as("ds"))
    agg0.join(delta, Seq("o_orderstatus"), "full_outer")
      .select(col("o_orderstatus"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("s0"), lit(0).cast(DecimalType(18, 4))) +
          coalesce(col("ds"), lit(0).cast(DecimalType(18, 4)))).cast("double").as("sum_price"))
      .filter(col("n_orders") > 0)
      .orderBy(col("o_orderstatus"))
  }

  val incrementalAggSql: String =
    """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |v1 AS (SELECT * FROM o WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
      |       UNION ALL SELECT * FROM o WHERE o_orderkey % 3 = 1)
      |SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM v1 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --------------------------------------------- partition-spec evolution
  /** Partition-spec EVOLUTION (Iceberg's signature layout feature): a
    * table that started life unpartitioned later switches to
    * `partitionBy(lang)` — old files keep the old layout, new files land
    * under lang=<v>/ directories, and a read must merge both without
    * rewriting history. Here batch A (even doc_ids) is the flat legacy
    * half, batch B (odd doc_ids) the partitioned half; the language
    * filter prunes DIRECTORIES on B (PartitionFilters) while A falls
    * back to row-group stats — exactly the mixed-cost read a 100 TB
    * table mid-migration serves, where rewriting the old layout would
    * cost more than it saves. unionByName aligns the two reads' column
    * orders (the partition column lands last in B's schema).
    */
  def partitionEvolution(spark: SparkSession, dir: String): DataFrame = {
    val flat = out("pevo_flat", dir)
    val part = out("pevo_part", dir)
    val d = docs(spark, dir)
    d.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(flat)
    d.filter(col("doc_id") % 2 === 1).write.mode("overwrite")
      .partitionBy("lang").parquet(part)
    partitionEvolutionReadback(spark, flat, part)
  }

  /** The merged-layout read side, split out so a spec can inspect its
    * pruning (the partitionedReadback precedent). */
  def partitionEvolutionReadback(spark: SparkSession, flat: String,
      part: String): DataFrame = {
    val cols = Seq("doc_id", "lang", "source", "n_chars").map(col)
    spark.read.parquet(flat).select(cols: _*)
      .unionByName(spark.read.parquet(part).select(cols: _*))
      .filter(col("lang").isin("en", "fr"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"), col("source"))
  }

  val partitionEvolutionSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents WHERE lang IN ('en', 'fr')
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // --------------------------------------------------- branch + merge
  /** BRANCH / fast-forward MERGE lifecycle
    * ([[graft.engine.Snapshots.createBranch]] / `.mergeBranch`) graded
    * end to end: main builds v0 (keys ≡ 0 mod 3); a branch forks
    * zero-copy, appends keys ≡ 1 mod 3 AND row-deletes main-inherited
    * keys ≡ 0 mod 15 — isolated work main cannot see (pinned by the
    * mid-flight main read); the fast-forward merge publishes the branch
    * state as main's v1 as pure metadata. Output: one row per state
    * (main@v0, branch@head, main@merged) summarized — the merged state
    * must equal the branch head EXACTLY, including the branch's deletes
    * of parent-inherited rows.
    */
  def branchMerge(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Snapshots
    val table = fresh(spark, out("snapbr_orders", dir))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false)
    Snapshots.createBranch(spark, table, "exp")
    val bd = Snapshots.branchDir(table, "exp")
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 1), bd, append = true)
    import spark.implicits._
    Snapshots.deleteRows(
      o.filter(col("o_orderkey") % 15 === 0).select(col("o_orderkey")),
      bd, "o_orderkey")
    val mainBefore = Snapshots.read(spark, table) // must still be pure v0
    Snapshots.mergeBranch(spark, table, "exp")
    def summarize(df: DataFrame, state: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .select(lit(state).as("state"), col("n_rows"), col("sum_price"),
          col("min_key"), col("max_key"))
    summarize(mainBefore, "main_at_fork")
      .unionByName(summarize(Snapshots.readBranch(spark, table, "exp"),
        "branch_head"))
      .unionByName(summarize(Snapshots.read(spark, table), "main_merged"))
      .orderBy(col("state"))
  }

  val branchMergeSql: String =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
      |v0 AS (SELECT * FROM o WHERE o_orderkey % 3 = 0),
      |bh AS (SELECT * FROM o WHERE (o_orderkey % 3 IN (0, 1))
      |       AND o_orderkey % 15 <> 0),
      |u AS (
      |  SELECT 'main_at_fork' AS state, COUNT(*) AS n_rows,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |    MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key FROM v0
      |  UNION ALL
      |  SELECT 'branch_head', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |    MIN(o_orderkey), MAX(o_orderkey) FROM bh
      |  UNION ALL
      |  SELECT 'main_merged', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
      |    MIN(o_orderkey), MAX(o_orderkey) FROM bh)
      |SELECT state, n_rows, sum_price, min_key, max_key
      |FROM u ORDER BY state""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fmt_branch_merge" -> (branchMerge _),
    "fmt_partition_evolution" -> (partitionEvolution _),
    "fmt_bloom_skipping" -> (bloomSkipping _),
    "fmt_history" -> (historyAudit _),
    "fmt_replace_where" -> (replaceWhere _),
    "fmt_delete_read" -> (deleteRead _),
    "fmt_incremental_agg" -> (incrementalAgg _),
    "fmt_manifest_prune" -> (manifestPrune _),
    "fmt_version_diff" -> (versionDiff _),
    "fmt_time_travel" -> (timeTravel _),
    "fmt_vacuum" -> (vacuumQuery _),
    "fmt_schema_evolution" -> (schemaEvolution _),
    "fmt_rename_column" -> (renameColumn _),
    "fmt_drop_column" -> (dropColumnQuery _),
    "fmt_check_constraint" -> (checkConstraintQuery _),
    "fmt_exactly_once" -> (exactlyOnceQuery _),
    "fmt_restore" -> (restoreVersion _),
    "fmt_shallow_clone" -> (shallowClone _),
    "fmt_compaction" -> (compaction _),
    "fmt_jsonl_roundtrip" -> (jsonlRoundtrip _),
    "fmt_orc_roundtrip" -> (orcRoundtrip _),
    "fmt_partitioned_prune" -> (partitionedPrune _),
    "fmt_range_layout" -> (rangeLayout _),
    "fmt_zorder_layout" -> (zorderLayout _),
    "fmt_hilbert_layout" -> (hilbertLayout _))

  val oracles: Map[String, String] = Map(
    "fmt_branch_merge" -> branchMergeSql,
    "fmt_partition_evolution" -> partitionEvolutionSql,
    "fmt_bloom_skipping" -> bloomSkippingSql,
    "fmt_history" -> historyAuditSql,
    "fmt_replace_where" -> replaceWhereSql,
    "fmt_delete_read" -> deleteReadSql,
    "fmt_incremental_agg" -> incrementalAggSql,
    "fmt_manifest_prune" -> manifestPruneSql,
    "fmt_version_diff" -> versionDiffSql,
    "fmt_time_travel" -> timeTravelSql,
    "fmt_vacuum" -> vacuumSql,
    "fmt_schema_evolution" -> schemaEvolutionSql,
    "fmt_rename_column" -> renameColumnSql,
    "fmt_drop_column" -> dropColumnSql,
    "fmt_check_constraint" -> checkConstraintSql,
    "fmt_exactly_once" -> exactlyOnceSql,
    "fmt_restore" -> restoreVersionSql,
    "fmt_shallow_clone" -> shallowCloneSql,
    "fmt_compaction" -> compactionSql,
    "fmt_jsonl_roundtrip" -> jsonlRoundtripSql,
    "fmt_orc_roundtrip" -> orcRoundtripSql,
    "fmt_partitioned_prune" -> partitionedPruneSql,
    "fmt_range_layout" -> rangeLayoutSql,
    "fmt_zorder_layout" -> zorderLayoutSql,
    "fmt_hilbert_layout" -> hilbertLayoutSql)
}
