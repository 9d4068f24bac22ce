package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink coverage beyond plain parquet reads: partitioned writes
  * with partition pruning, JSON round-trips, and CSV write/read — the
  * layouts a 100 TB warehouse actually uses (partition pruning turns a
  * full scan into a directory listing).
  */
class SourcesSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned parquet write + partition-pruned read") {
    val out = tmpDir("graft_part")
    val orders = graft.engine.Tables.load(spark, sf(), "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())

    // a filter on the partition column must prune at planning time, not scan
    val pruned = back.filter(col("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"), scan.take(500))
    assert(pruned.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("JSON sink/source round-trip preserves rows and types survive re-read") {
    val out = tmpDir("graft_json")
    val nation = graft.engine.Tables.load(spark, sf(), "nation")
    nation.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
    assert(back.count() == nation.count())
    // JSON loses static typing (longs come back as longs, ints widen);
    // values must survive
    val names = back.select("n_name").collect().map(_.getString(0)).toSet
    assert(names == nation.select("n_name").collect().map(_.getString(0)).toSet)
  }

  test("CSV sink/source round-trip through the reference inference rules") {
    val out = tmpDir("graft_csv")
    val region = graft.engine.Tables.load(spark, sf(), "region")
      .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
    region.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
    val (typed, meta) = graft.catalog.CsvInference.load(spark, out, "region_rt")
    assert(typed.schema("r_regionkey").dataType.simpleString == "bigint")
    assert(typed.schema("r_name").dataType.simpleString == "string")
    assert(meta.rowCount == region.count())
  }
}
