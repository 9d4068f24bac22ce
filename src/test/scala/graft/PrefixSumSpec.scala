package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.window.WindowExec

import graft.engine.PrefixSum

/** The recursive chunked carry must equal the single global window it
  * replaces, bit for bit — including the NULL on the first row — while
  * never declaring an unpartitioned window (the all-to-one WindowExec
  * the 100 TB design bans; VERDICT r12 item 4).
  */
class PrefixSumSpec extends SparkSpecBase {

  private def reference(keys: Seq[(Long, Long)], isMax: Boolean): Map[Long, Option[Long]] = {
    val sorted = keys.sortBy(_._1)
    sorted.indices.map { i =>
      val before = sorted.take(i).map(_._2)
      sorted(i)._1 -> (if (before.isEmpty) None
        else Some(if (isMax) before.max else before.sum))
    }.toMap
  }

  private def run(keys: Seq[(Long, Long)], isMax: Boolean): Unit = {
    import spark.implicits._
    val df = keys.toDF("k", "v").repartition(7)
    val got0 = if (isMax) PrefixSum.exclusiveMax(df, "k", "v", "pre")
      else PrefixSum.exclusiveSum(df, "k", "v", "pre")
    // no unpartitioned window anywhere in the physical plan (recurse
    // through AQE — the adaptive root hides the real operators)
    val wins = PrefixSumSpec.windows(got0.queryExecution.executedPlan)
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      got0.queryExecution.executedPlan.toString)
    val got = got0.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(got == reference(keys, isMax))
  }

  test("exclusive sum == global window: dense keys") {
    run((0L until 3000L).map(k => k -> (k % 17 - 3)), isMax = false)
  }

  test("exclusive sum == global window: sparse keys spanning all four levels") {
    val rnd = new scala.util.Random(42)
    // keys scattered to 2^39 so chunk/superchunk/top contraction all engage
    val keys = (0 until 500).map(_ => (rnd.nextLong(1L << 39), rnd.nextLong(1000) - 200L))
      .groupBy(_._1).map(_._2.head).toSeq // unique keys
    run(keys, isMax = false)
  }

  test("exclusive max == global window, null first row preserved") {
    val rnd = new scala.util.Random(7)
    val keys = (0 until 800).map(i => (i * 1311L + rnd.nextLong(100), rnd.nextLong(1L << 40)))
      .groupBy(_._1).map(_._2.head).toSeq
    run(keys, isMax = true)
    run(Seq(5L -> 9L), isMax = true)   // singleton → NULL carry
    run(Seq(5L -> 9L), isMax = false)
  }

  test("single chunk (all keys < 1024) still exact") {
    run((0L until 100L).map(k => k -> k * k), isMax = false)
    run((0L until 100L).map(k => k -> (100L - k)), isMax = true)
  }

  test("ntileByCountingRank == ntile window, asc and desc, heavy ties, n % k != 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // 997 rows (997 % 4 = 1 — exercises the uneven-bucket boundary),
    // values drawn from a SMALL grid so tie groups span tile boundaries
    val rows = (0L until 997L).map(id => (id, rnd.nextInt(37).toLong))
    val df = rows.toDF("id", "v").repartition(5)
    for (desc <- Seq(false, true); k <- Seq(4, 10)) {
      val got = (if (desc)
          graft.engine.PrefixSum.ntileByCountingRank(df, k, "v", "id", desc = true, "t")
        else
          graft.engine.PrefixSum.ntileByCountingRank(df, k, "v", "id", desc = false, "t"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val w = Window.orderBy(if (desc) col("v").desc else col("v").asc, col("id"))
      val want = df.withColumn("t", ntile(k).over(w))
        .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
      assert(got == want, s"desc=$desc k=$k")
    }
    // no unpartitioned window in the counting form's plan
    val plan = graft.engine.PrefixSum
      .ntileByCountingRank(df, 4, "v", "id", desc = true, "t")
      .queryExecution.executedPlan
    val wins = PrefixSumSpec.windows(plan)
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty), plan.toString)
  }
}

object PrefixSumSpec {
  /** Every WindowExec in the plan, recursing through adaptive roots. */
  def windows(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
    p.collect {
      case w: WindowExec => Seq(w)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        windows(a.executedPlan)
    }.flatten
}
