package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge

import graft.plans.{AsofJoinPlan, AsofJoinStrategy}

/** Public API for the native as-of join operator (graft.plans.AsofJoinExec).
  *
  * `Asof.join(events, orders, "user_id", "o_custkey", "ts", "o_orderdate")`
  * returns events ++ the matched order columns for the greatest
  * o_orderdate ≤ ts per key (inner semantics).
  */
object Asof {

  /** Idempotently register the planner strategy on the session. */
  def register(spark: SparkSession): Unit = {
    val es = spark.experimental
    if (!es.extraStrategies.contains(AsofJoinStrategy))
      es.extraStrategies = es.extraStrategies :+ AsofJoinStrategy
  }

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    Bridge.ofRows(spark, AsofJoinPlan(lp, rp,
      Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
      attr(lp, leftTime), attr(rp, rightTime)))
  }
}
