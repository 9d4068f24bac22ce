package graft

import java.sql.Timestamp

import graft.ops.Asof

/** Edge cases for the native as-of join operator (AsofJoinExec), beyond
  * the 10k-row DuckDB ASOF oracle check (q26).
  */
class AsofJoinSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the greatest right time <= left time; inner semantics; exact-time tie matches") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 200.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:06:00")), // between quotes -> 101.0
      (11L, 1L, ts("2024-01-01 10:05:00")), // exact tie -> 101.0
      (12L, 1L, ts("2024-01-01 09:59:00")), // before all -> no match
      (13L, 2L, ts("2024-01-01 11:00:00")), // after last -> 200.0
      (14L, 3L, ts("2024-01-01 10:00:00"))) // key with no quotes -> no match
      .toDF("trade_id", "t_key", "t_ts")
    val r = Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(10L -> 101.0, 11L -> 101.0, 13L -> 200.0))
  }

  test("physical plan uses AsofJoinExec with exchanges and sorts injected") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i.toLong % 5, ts(f"2024-01-01 10:${i % 60}%02d:00"), i))
      .toDF("k", "t", "v")
    val r = (1 to 20).map(i => (i.toLong % 5, ts(f"2024-01-01 09:${i % 60}%02d:00"), i))
      .toDF("k2", "t2", "w")
    val j = Asof.join(l, r, "k", "k2", "t", "t2")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(600))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(600))
    assert(plan.contains("Sort ["), plan.take(600))
    assert(j.count() > 0)
  }

  test("tolerance bounds match staleness: inner drops, left-outer null-extends") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 08:00:00"), 200.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:06:00")), // 1 min stale -> 101.0
      (11L, 1L, ts("2024-01-01 10:20:00")), // 15 min stale -> out of tolerance
      (12L, 2L, ts("2024-01-01 10:00:00"))) // 2 h stale -> out of tolerance
      .toDF("trade_id", "t_key", "t_ts")
    val tenMin = Some(10L * 60 * 1000000L)
    val inner = Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        tolerance = tenMin)
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(inner == Map(10L -> 101.0))
    val outer = Asof.leftJoin(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        tolerance = tenMin)
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    assert(outer == Map(10L -> Some(101.0), 11L -> None, 12L -> None))
    // tolerance in the DATE type's own units (days)
    import org.apache.spark.sql.functions.to_date
    val l = Seq((1L, "2024-03-10", 7)).toDF("k", "d", "v")
      .withColumn("d", to_date($"d"))
    val r = Seq((1L, "2024-03-01", 50.0)).toDF("k2", "d2", "w")
      .withColumn("d2", to_date($"d2"))
    assert(Asof.join(l, r, "k", "k2", "d", "d2", tolerance = Some(5L)).count() == 0)
    assert(Asof.join(l, r, "k", "k2", "d", "d2", tolerance = Some(9L)).count() == 1)
    // invalid: negative tolerance and non-integer time types fail fast
    intercept[IllegalArgumentException] {
      Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        tolerance = Some(-1L))
    }
  }

  test("DateType time column works (no Long hardcoding)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_date
    val l = Seq((1L, "2024-03-10", 7), (1L, "2024-03-01", 8))
      .toDF("k", "d", "v").withColumn("d", to_date($"d"))
    val r = Seq((1L, "2024-03-05", 50.0), (1L, "2024-03-09", 90.0))
      .toDF("k2", "d2", "w").withColumn("d2", to_date($"d2"))
    val out = Asof.join(l, r, "k", "k2", "d", "d2")
      .select("v", "w").collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    // v=7 @03-10 -> latest quote 03-09 (90.0); v=8 @03-01 -> none
    assert(out == Map(7 -> 90.0))
  }

  test("IntegerType yyyymmdd time column works") {
    import spark.implicits._
    val l = Seq((1L, 20240310, 7)).toDF("k", "d", "v")
    val r = Seq((1L, 20240305, 50.0), (1L, 20240401, 99.0)).toDF("k2", "d2", "w")
    val out = Asof.join(l, r, "k", "k2", "d", "d2")
      .select("v", "w").collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(out == Map(7 -> 50.0))
  }

  test("NULL keys never match (SQL equi-join semantics, not RowOrdering null==null)") {
    import spark.implicits._
    val l = Seq((Option(1L), ts("2024-01-01 10:00:00"), 1),
                (Option.empty[Long], ts("2024-01-01 10:00:00"), 2))
      .toDF("k", "t", "v")
    val r = Seq((Option(1L), ts("2024-01-01 09:00:00"), 10.0),
                (Option.empty[Long], ts("2024-01-01 09:00:00"), 20.0))
      .toDF("k2", "t2", "w")
    val out = Asof.join(l, r, "k", "k2", "t", "t2")
      .select("v", "w").collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(out == Map(1 -> 10.0)) // null-key left row 2 matches nothing
  }

  test("self-join (shared lineage) dedups attributes and runs") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
                 (1L, ts("2024-01-01 11:00:00"), 2.0)).toDF("k", "t", "x")
    val j = Asof.join(df, df, "k", "k", "t", "t")
    // every row as-of-matches itself (greatest t' <= t is t itself)
    val got = j.collect()
    assert(got.length == 2 && j.columns.length == 6)
    assert(got.forall(r => r.getTimestamp(1) == r.getTimestamp(4)))
  }

  test("mismatched time types fail fast at plan construction") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val r = Seq((1L, 20240101)).toDF("k2", "d")
    val e = intercept[IllegalArgumentException](
      Asof.join(l, r, "k", "k2", "t", "d"))
    assert(e.getMessage.contains("same type"))
  }

  test("left-outer: unmatched and null-key lefts null-extend instead of dropping") {
    import spark.implicits._
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 100.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (10L, Option(1L), ts("2024-01-01 11:00:00")), // matches
      (11L, Option(1L), ts("2024-01-01 09:00:00")), // before all quotes -> null
      (12L, Option(2L), ts("2024-01-01 11:00:00")), // key without quotes -> null
      (13L, Option.empty[Long], ts("2024-01-01 11:00:00"))) // null key -> null
      .toDF("trade_id", "t_key", "t_ts")
    val r = Asof.leftJoin(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(r == Map(10L -> Some(100.0), 11L -> None, 12L -> None, 13L -> None))
  }

  test("missing column gives a clear error") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "t")
    val e = intercept[IllegalArgumentException](
      Asof.join(l, l, "nope", "k", "t", "t"))
    assert(e.getMessage.contains("nope"))
  }

  test("forward: picks the smallest right time >= left; ties match; rights shared") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 200.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:01:00")), // next quote -> 101.0
      (11L, 1L, ts("2024-01-01 10:02:00")), // SAME next quote -> 101.0 (shared)
      (12L, 1L, ts("2024-01-01 10:05:00")), // exact tie -> 101.0 (inclusive)
      (13L, 1L, ts("2024-01-01 10:11:00")), // after last -> no match
      (14L, 2L, ts("2024-01-01 09:00:00")), // -> 200.0
      (15L, 3L, ts("2024-01-01 10:00:00"))) // key with no quotes -> no match
      .toDF("trade_id", "t_key", "t_ts")
    val r = Asof.joinForward(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(10L -> 101.0, 11L -> 101.0, 12L -> 101.0, 14L -> 200.0))
    // left-outer forward null-extends the unmatched
    val lo = Asof.joinForward(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        isLeftOuter = true)
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    assert(lo(13L).isEmpty && lo(15L).isEmpty && lo(10L).contains(101.0))
    assert(lo.size == 6)
  }

  test("nearest: closer side wins each way, exact ties go backward") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, 101L, ts("2024-01-01 10:10:00"), 101.0),
      (2L, 102L, ts("2024-01-01 12:00:00"), 200.0))
      .toDF("q_key", "q_id", "q_ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:01:00")), // 1 min back vs 9 fwd -> 100.0
      (11L, 1L, ts("2024-01-01 10:09:00")), // 9 back vs 1 fwd -> 101.0
      (12L, 1L, ts("2024-01-01 10:05:00")), // exact tie -> backward 100.0
      (13L, 2L, ts("2024-01-01 09:00:00")), // only forward -> 200.0
      (14L, 2L, ts("2024-01-01 13:00:00")), // only backward -> 200.0
      (15L, 3L, ts("2024-01-01 10:00:00"))) // no quotes -> drops (inner)
      .toDF("trade_id", "t_key", "t_ts")
    val r = Asof.joinNearest(trades, quotes, "trade_id",
        "t_key", "q_key", "t_ts", "q_ts")
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(10L -> 100.0, 11L -> 101.0, 12L -> 100.0,
      13L -> 200.0, 14L -> 200.0))
    // left outer keeps the unmatched trade null-extended
    val lo = Asof.joinNearest(trades, quotes, "trade_id",
        "t_key", "q_key", "t_ts", "q_ts", isLeftOuter = true)
    assert(lo.count() == 6 &&
      lo.filter(org.apache.spark.sql.functions.col("price").isNull).count() == 1)
  }

  test("forward tolerance bounds the wait: distant next match drops") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 12:00:00"), 200.0))
      .toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")), // 5 min ahead -> in tolerance
      (11L, 2L, ts("2024-01-01 10:00:00"))) // 2 h ahead -> out
      .toDF("trade_id", "t_key", "t_ts")
    val r = Asof.joinForward(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        tolerance = Some(10L * 60 * 1000000L))
      .select("trade_id", "price").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(10L -> 101.0))
  }
}
