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

  /** `events.ts` is INT64 TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the
    * legacy conf and floor-convert to microsecond TimestampType — the same
    * truncation DuckDB applies when casting TIMESTAMP_NS to TIMESTAMP.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view (the catalog surface the reference
    * exposes via `LOAD TABLE` / `SHOW TABLES`, /root/reference/src/cli/main.cpp:152-187).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
