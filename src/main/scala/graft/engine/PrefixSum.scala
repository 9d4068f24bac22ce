package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix aggregation (running SUM or MAX of all
  * STRICTLY-EARLIER keys) over a frame with UNIQUE non-negative integer
  * keys — the carry step of every two-level chunked scan in this repo
  * (shard packing, watermark prefix-max, counting-sort ranks, tercile
  * cuts).
  *
  * Why not one `Window.orderBy(key)`: an unpartitioned window moves the
  * whole frame through a single partition (WindowExec's all-to-one
  * WARN) — bounded today at corpus/1024 rows, but ~10⁸ rows through one
  * task at 100 TB, the exact scale-killer the two-level design exists
  * to avoid (VERDICT r12 item 4). This helper recurses the carry
  * instead: three window levels each partitioned by `key div 1024^i`
  * (≤1024 rows per partition because keys are unique), then the
  * remaining ≤ maxKey/2³⁰-row top table folds in ONE global aggregate
  * as a sorted array (the [[graft.streaming.Events]] sesBacktest
  * pattern — a global agg is a partial+final reduce, not a
  * single-partition sort). Carries rejoin downward as broadcasts
  * (≤ maxKey/2¹⁰ rows, id+total pairs only).
  *
  * Domain: keys unique per row, 0 ≤ key < 2⁴⁰ (at 2⁴⁰ the top table is
  * exactly 1024 rows — comfortably past the 100 TB envelope: item ids
  * to 10¹² contract to chunk keys ≤ 10⁹ before this helper ever runs),
  * value column integral (LongType math). Rows with no earlier key get
  * NULL (callers coalesce for sums, or feed `greatest` for maxima —
  * both null-skipping), matching the `rowsBetween(unboundedPreceding,
  * -1)` window this replaces bit for bit.
  */
object PrefixSum {

  /** `df` plus column `out` = SUM of `v` over all rows with smaller `key`
    * (NULL when none).
    */
  def exclusiveSum(df: DataFrame, key: String, v: String, out: String): DataFrame =
    exclusive(df, key, v, out, isMax = false)

  /** `df` plus column `out` = MAX of `v` over all rows with smaller `key`
    * (NULL when none).
    */
  def exclusiveMax(df: DataFrame, key: String, v: String, out: String): DataFrame =
    exclusive(df, key, v, out, isMax = true)

  /** Exact distributed NTILE(buckets) — Spark's `ntile` needs one total
    * order, which WindowExec executes as an all-to-one partition; this
    * form is the distributed counting sort instead: per-value counts →
    * chunked carry ([[exclusiveSum]]) → within-value `row_number`
    * (partitions = tie groups) → the global rank, then the standard
    * ntile boundary arithmetic (first n mod k buckets take ⌈n/k⌉). Ties
    * order by `tie` ascending regardless of direction — `desc = true`
    * ranks by (value DESC, tie ASC), implemented as the REVERSAL of the
    * (value ASC, tie DESC) rank, which needs no key negation (keys stay
    * in [[exclusiveSum]]'s non-negative <2⁴⁰ domain).
    *
    * Requirements: `v` integral, ≥ 0, < 2⁴⁰ (quantize first — cents,
    * days, counts); `tie` unique per row. Bit-compatible with
    * `NTILE(buckets) OVER (ORDER BY v [DESC], tie)` on both engines.
    */
  def ntileByCountingRank(df: DataFrame, buckets: Int, v: String,
      tie: String, desc: Boolean, out: String): DataFrame = {
    // the input branches three ways (per-value counts, the ranked rows,
    // the 1-row n) and callers CHAIN these (one tile column per metric):
    // unstaged, each level would recompute the whole upstream plan per
    // branch — multiplicative blowup (measured 17 s for three chained
    // quartiles over a 0.6 s base). Staged, cost is linear per level.
    val d = Materialize.stage(df)
    val counts = d.groupBy(col(v).as("_nt_v")).agg(count(lit(1)).as("_nt_c"))
    val carry = exclusiveSum(counts, "_nt_v", "_nt_c", "_nt_pre")
      .select(col("_nt_v"), coalesce(col("_nt_pre"), lit(0L)).as("_nt_carry"))
    val wTie = Window.partitionBy(col(v))
      .orderBy(if (desc) col(tie).desc else col(tie).asc)
    val n = d.agg(count(lit(1)).as("_nt_n"))
    val ranked = d
      .withColumn("_nt_w", row_number().over(wTie).cast("long"))
      .join(broadcast(carry), col(v) === col("_nt_v"))
      .crossJoin(broadcast(n))
      .withColumn("_nt_i",
        if (desc) col("_nt_n") + 1L - (col("_nt_carry") + col("_nt_w"))
        else col("_nt_carry") + col("_nt_w"))
    // ntile boundaries: q = n div k, r = n mod k; the first r buckets
    // hold q+1 rows each
    val k = buckets.toLong
    ranked.withColumn(out, expr(
      s"""CASE WHEN _nt_i <= (_nt_n div $k + 1L) * (_nt_n % $k)
        |  THEN (_nt_i - 1L) div (_nt_n div $k + 1L) + 1L
        |  ELSE _nt_n % $k
        |    + (_nt_i - 1L - (_nt_n div $k + 1L) * (_nt_n % $k))
        |      div (_nt_n div $k) + 1L
        |END""".stripMargin))
      .drop("_nt_v", "_nt_c", "_nt_carry", "_nt_w", "_nt_n", "_nt_i")
  }

  private def exclusive(df0: DataFrame, key: String, v: String, out: String,
      isMax: Boolean): DataFrame = {
    // staged: the input feeds BOTH the within-chunk window (l1) and the
    // chunk-totals aggregate (t1), and their exchanges canonicalize
    // differently (window exchange vs partial-aggregate exchange), so
    // ReuseExchange does not share them — un-staged, every caller paid
    // the input's whole lineage twice, and CHAINED calls (ks/mwu's double
    // carry, the ntile quartets) compounded multiplicatively (PlanAudit
    // r16: events_ks_test carried a 46-node subtree ×2, a 45-node ×3 and
    // a 14-node ×6; guide §1.2). The frame is a per-key count/total
    // table — KBs to MBs at any corpus size, the cheapest cut available.
    val df = Materialize.stage(df0)
    def ag(c: Column): Column = if (isMax) max(c) else sum(c)
    // exclusive combine preserving NULL-when-no-predecessor: greatest
    // skips nulls; the sum form must not turn (null, null) into 0
    def combine(carry: Column, within: Column): Column =
      if (isMax) greatest(carry, within)
      else when(carry.isNull && within.isNull, lit(null))
        .otherwise(coalesce(carry, lit(0L)) + coalesce(within, lit(0L)))

    // within-chunk exclusive prefix: ≤1024 rows per partition (unique keys)
    def level(frame: DataFrame, k: String, value: String, pre: String,
        ck: String): DataFrame = {
      val w = Window.partitionBy(expr(s"$k div 1024")).orderBy(col(k))
        .rowsBetween(Window.unboundedPreceding, -1)
      frame.withColumn(pre, ag(col(value)).over(w))
        .withColumn(ck, expr(s"$k div 1024"))
    }
    def totals(frame: DataFrame, k: String, value: String, ck: String,
        t: String): DataFrame =
      frame.groupBy(expr(s"$k div 1024").as(ck)).agg(ag(col(value)).as(t))

    val l1 = level(df, key, v, "_ps_pre1", "_ps_c1")
    val t1 = totals(df, key, v, "_ps_c1", "_ps_t1")
    val l2 = level(t1, "_ps_c1", "_ps_t1", "_ps_pre2", "_ps_c2")
    val t2 = totals(t1, "_ps_c1", "_ps_t1", "_ps_c2", "_ps_t2")
    val l3 = level(t2, "_ps_c2", "_ps_t2", "_ps_pre3", "_ps_c3")
    val t3 = totals(t2, "_ps_c2", "_ps_t2", "_ps_c3", "_ps_t3")

    // top: ≤ maxKey/2³⁰ rows fold in one global aggregate as a sorted
    // array — exclusive prefix per element via slice of the earlier ones
    val foldExpr =
      if (isMax)
        """transform(_ps_xs, (x, i) -> struct(x.k AS k,
          |  aggregate(slice(_ps_xs, 1, i), CAST(NULL AS BIGINT),
          |    (a, y) -> CASE WHEN a IS NULL OR y.t > a THEN y.t ELSE a END)
          |  AS p))""".stripMargin
      else
        """transform(_ps_xs, (x, i) -> struct(x.k AS k,
          |  CASE WHEN i = 0 THEN CAST(NULL AS BIGINT)
          |    ELSE aggregate(slice(_ps_xs, 1, i), 0L, (a, y) -> a + y.t)
          |  END AS p))""".stripMargin
    val top = t3
      .agg(array_sort(collect_list(struct(col("_ps_c3").as("k"),
        col("_ps_t3").cast("long").as("t")))).as("_ps_xs"))
      .select(explode(expr(foldExpr)).as("_ps_s"))
      .select(col("_ps_s.k").as("_ps_c3"), col("_ps_s.p").as("_ps_pre4"))

    // carries rejoin downward: each level's carry = parent carry ⊕ the
    // within-parent exclusive prefix; all right sides are id+total pairs
    val carry3 = l3.join(broadcast(top), Seq("_ps_c3"), "left")
      .select(col("_ps_c2"),
        combine(col("_ps_pre4"), col("_ps_pre3")).as("_ps_carry3"))
    val carry2 = l2.join(broadcast(carry3), Seq("_ps_c2"), "left")
      .select(col("_ps_c1"),
        combine(col("_ps_carry3"), col("_ps_pre2")).as("_ps_carry2"))
    l1.join(broadcast(carry2), Seq("_ps_c1"), "left")
      .withColumn(out, combine(col("_ps_carry2"), col("_ps_pre1")))
      .drop("_ps_pre1", "_ps_c1", "_ps_carry2")
  }
}
