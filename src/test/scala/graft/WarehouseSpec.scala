package graft

import org.apache.spark.sql.functions._

import graft.queries.Warehouse

/** Semantics tests for the warehouse-maintenance operators (histogram
  * profile, MERGE upsert, SCD2 history) at sf0.001, plus invariants a
  * value-level oracle can't express (bucket coverage, merge row algebra,
  * validity-chain contiguity).
  */
class WarehouseSpec extends SparkSpecBase {

  test("histogram buckets cover every order exactly once and bound the data") {
    val orders = graft.engine.Tables.load(spark, sf(), "orders")
    val h = Warehouse.q54Histogram(spark, sf()).collect()
    assert(h.map(_.getLong(3)).sum == orders.count())
    assert(h.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 24))
    // regular buckets are 20k wide; bucket 24 is the unbounded overflow
    assert(h.filter(_.getInt(0) < 24).forall(r => r.getLong(2) - r.getLong(1) == 20000L))
    assert(h.filter(_.getInt(0) == 24).forall(_.isNullAt(2)))
  }

  test("merge upsert applies update/delete/insert row algebra") {
    val o = graft.engine.Tables.load(spark, sf(), "orders")
    val n = o.count()
    val nUpd = o.filter(col("o_orderkey") % 7 === 0).count()
    val nDel = o.filter(col("o_orderkey") % 11 === 0 && col("o_orderkey") % 7 =!= 0).count()
    val nIns = o.filter(col("o_orderkey") % 13 === 0).count()
    val maxKey = o.agg(max(col("o_orderkey"))).head().getLong(0)

    val m = Warehouse.q55MergeUpsert(spark, sf())
    assert(m.count() == n - nDel + nIns)
    // updates carry the bumped price and the U status
    assert(m.filter(col("o_orderstatus") === "U").count() == nUpd)
    // deleted keys are gone
    assert(m.filter(col("o_orderkey") % 11 === 0 && col("o_orderkey") % 7 =!= 0
      && col("o_orderkey") <= maxKey).count() == 0)
    // inserts all land strictly above the old key space
    assert(m.filter(col("o_orderstatus") === "I").count() == nIns)
    assert(m.filter(col("o_orderkey") > maxKey).count() == nIns)
  }

  test("scd2 versions are contiguous per customer with exactly one current row") {
    val s = Warehouse.q56Scd2(spark, sf())
    val perCust = s.groupBy(col("o_custkey"))
      .agg(sum(col("is_current")).as("cur"), count(lit(1)).as("n"))
    // one open-ended current version per customer
    assert(perCust.filter(col("cur") =!= 1).count() == 0)
    // the validity chain links: this row's valid_to = next row's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("version"))
    val broken = s.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    assert(broken.count() == 0)
  }

  test("q60 skew probe: shares and salt factors are the exact integer forms") {
    val rows = Warehouse.q60SkewProbe(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 10)
    // descending by count, user_id tie-break
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
    val total = graft.engine.Tables.load(spark, sf(), "events").count()
    rows.foreach { case (_, cnt, ppm, salt) =>
      assert(ppm == cnt * 1000000L / total)
      assert(salt == ((cnt * 32 + total - 1) / total).toInt)
      assert(salt >= 1)
    }
  }

  test("q61 approx-percentile rank bound holds at both fixture scales") {
    for (dir <- Seq("/root/testdata/sf0.001", sf())) {
      val r = graft.queries.Core.q61ApproxPctlBound(spark, dir).head()
      assert(r.getBoolean(1) && r.getBoolean(2), s"$dir: $r")
    }
  }
}
