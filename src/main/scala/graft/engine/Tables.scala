package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet testdata
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md §2).
  *
  * Scale posture: each table is a plain parquet read, so on a real cluster
  * the scan parallelism follows the file splits and Catalyst prunes
  * columns/pushes filters into the scan. Nothing is collected or cached at
  * load time; callers decide caching per query.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor the
    * reference targets (region=5 rows, nation=25; customer/supplier/part
    * grow with sf but stay several orders below the fact tables).
    */
  val dims: Set[String] = Set("region", "nation", "customer", "supplier", "part")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` arrives in one of two generator vintages: INT64
    * TIMESTAMP(NANOS) — which Spark 4 refuses to read as a timestamp
    * (PARQUET_TYPE_ILLEGAL), so the legacy conf reads it as raw nanos —
    * or native microsecond TIMESTAMP (surfacing as TIMESTAMP_NTZ).
    * Normalize both to microsecond TimestampType so every downstream
    * window/session/interval operator sees one type; with the session
    * timezone pinned to UTC the NTZ cast is value-preserving, and the
    * nanos floor-division is the same truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Normalize an events frame's `ts` to microsecond TimestampType,
    * whatever vintage the parquet schema delivered (raw INT64 nanos,
    * TIMESTAMP_NTZ micros, or already-normalized TimestampType).
    *
    * Precondition: the session timezone must be UTC — the NTZ→TZ cast
    * reinterprets the wall-clock instant in the session zone, so any other
    * zone would silently shift every event timestamp (ADVICE r8). Enforced
    * rather than documented: a misconfigured session fails loudly here
    * instead of producing shifted windows three operators downstream.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
          s"normalizeTs requires spark.sql.session.timeZone=UTC (got '$tz'): " +
            "the TIMESTAMP_NTZ cast is only value-preserving under UTC")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** Register every table as a temp view (the catalog surface the reference
    * exposes via `LOAD TABLE` / `SHOW TABLES`, /root/reference/src/cli/main.cpp:152-187).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
