package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.MvAdvisor

class MvAdvisorSpec extends SparkSpecBase {

  test("advisor synthesizes the join-view candidate a q115-family workload needs; non-view shapes emit nothing") {
    val dir = sf()
    def li = graft.engine.Tables.load(spark, dir, "lineitem")
    def o = graft.engine.Tables.load(spark, dir, "orders")
    // a dashboard family over the same join, different grains/filters
    val q1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val q2 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("s"))
    // a single-table aggregate family member
    val q3 = li.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
    // NOT view-shaped: aggregate over a window-derived frame
    val q4 = li.withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("l_orderkey"))))
      .filter(col("rn") === 1)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val cands = MvAdvisor.advise(
      Map("q1" -> q1, "q2" -> q2, "q3" -> q3, "q4" -> q4))

    val join = cands.find(_.base.contains(" ⋈ ")).get
    assert(join.queries == Seq("q1", "q2"))
    assert(join.base.contains("lineitem.parquet") &&
      join.base.contains("orders.parquet") &&
      join.base.contains("l_orderkey = o_orderkey"), join.base)
    // the union grain covers every family member — and matches the
    // registry def q115 actually answers from
    assert(join.dims.toSet ==
      Set("l_returnflag", "o_orderpriority", "o_orderstatus"))
    val d = graft.engine.MatView.joinRegistry("lineitem_orders")
    assert(join.dims.toSet.subsetOf(d.dims.toSet),
      "synthesized grain must be answerable by the registered view")
    assert(join.aggs.exists(_.startsWith("count")) &&
      join.aggs.exists(_.startsWith("sum")), join.aggs.mkString(";"))

    val single = cands.find(c =>
      !c.base.contains(" ⋈ ") && c.base.contains("lineitem.parquet")).get
    assert(single.queries == Seq("q3") && single.dims == Seq("l_returnflag"))

    // the window-derived aggregate never pollutes a candidate
    assert(cands.forall(c => !c.queries.contains("q4")))
  }
}
