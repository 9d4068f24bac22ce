package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materialized aggregate view over lineitem — the summary table behind
  * [[graft.plans.MvRewriteRule]]'s transparent query rewrite.
  *
  * Grain: (l_returnflag, l_linestatus, l_shipdate) — the dashboard
  * dimensions — carrying the re-aggregable partial states: `mv_cnt`
  * (row count, answers COUNT(*)) and `mv_sum_l_quantity` (partial sum,
  * answers SUM(l_quantity); quantities are integral so the double sum
  * is exact at any partition order). At 100 TB this is THE classic
  * win: the base fact has ~10⁴ rows per (flag, status, day) cell, so a
  * rewritten dashboard aggregate scans 10⁴× fewer bytes — and because
  * the rewrite happens in the optimizer, no query text changes.
  *
  * The view is maintained like any other snapshot table (rebuild per
  * partition / incremental-agg fold, see sources/Formats incremental
  * agg); here the builder is the one-shot batch form.
  */
object MatView {

  /** Dimension columns the rewrite can group/filter by. */
  val lineitemDims: Seq[String] = Seq("l_returnflag", "l_linestatus", "l_shipdate")

  def buildLineitem(spark: SparkSession, dir: String, mvPath: String): Unit =
    aggregate(Tables.load(spark, dir, "lineitem"))
      .write.mode("overwrite").parquet(mvPath)

  /** The view's aggregation, factored so deltas use the identical fold.
    * `mv_sum_price_cents` carries the repo's exact-cents revenue idiom
    * (floor(price·100 + 0.5) — an integer, so partial sums re-add
    * exactly), answering `SUM(floor(l_extendedprice * 100.0 + 0.5))`.
    */
  def aggregate(lineitem: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lineitem.groupBy(lineitemDims.map(col): _*)
      .agg(count(lit(1)).as("mv_cnt"),
        sum(col("l_quantity")).as("mv_sum_l_quantity"),
        sum(expr("floor(l_extendedprice * 100.0 + 0.5)")).as("mv_sum_price_cents"),
        // MIN/MAX are re-aggregable monoids like the sums — carried so
        // the rewrite can answer MIN/MAX(l_quantity) from the view
        min(col("l_quantity")).as("mv_min_l_quantity"),
        max(col("l_quantity")).as("mv_max_l_quantity"))

  /** Incremental maintenance: fold a DELTA batch of base rows into an
    * existing view state — the partial states are an abelian monoid
    * (counts and sums add), so refresh is
    * `Σ per-cell (old ⊕ delta-partial)`, never a base-table rescan.
    * This is what keeps the [[graft.plans.MvRewriteRule]] view fresh
    * under streaming ingest at 100 TB: the delta is one micro-batch,
    * the fold shuffles only (dims, partial) rows.
    */
  def applyDelta(mv: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    mv.unionByName(aggregate(delta))
      .groupBy(lineitemDims.map(col): _*)
      .agg(sum(col("mv_cnt")).as("mv_cnt"),
        sum(col("mv_sum_l_quantity")).as("mv_sum_l_quantity"),
        sum(col("mv_sum_price_cents")).as("mv_sum_price_cents"),
        min(col("mv_min_l_quantity")).as("mv_min_l_quantity"),
        max(col("mv_max_l_quantity")).as("mv_max_l_quantity"))
}
