package graft.sqlapi

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog.Catalog
import graft.plans.GraftExtensions

/** The SQL front door (SURVEY §7.1): a thin facade over `spark.sql` for
  * library users — the reference's `execute_select_sql` and `EXPLAIN`
  * entry points (/root/reference/src/cli/main.cpp:40-57, 209-228) with
  * graft's native functions registered. No hand-written parser, no custom
  * planner: Catalyst is the engine, this class is the surface.
  */
class QueryEngine(val spark: SparkSession) {

  GraftExtensions.register(spark)

  val catalog = new Catalog(spark)

  /** Run any Spark SQL text against the registered catalog. */
  def sql(text: String): DataFrame = spark.sql(text)

  /** Optimized logical + physical plan, a superset of the reference's
    * logical-only EXPLAIN.
    */
  def explain(text: String): String = {
    val qe = spark.sql(text).queryExecution
    s"== Optimized Logical Plan ==\n${qe.optimizedPlan}\n== Physical Plan ==\n${qe.executedPlan}"
  }
}
