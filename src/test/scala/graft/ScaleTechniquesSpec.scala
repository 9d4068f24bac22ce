package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

/** The scale techniques that don't show up in small-sf oracle results:
  * salted joins for hot keys and bucketed tables for shuffle-free
  * co-located joins. These tests pin the *mechanism* (result equivalence,
  * plan shape) so it's ready when data actually skews.
  */
class ScaleTechniquesSpec extends SparkSpecBase {

  test("salted join equals plain join on a skewed corpus") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail, joined to a dim table
    val left = ((1 to 10000).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => (i.toLong, s"t$i"))).toDF("k", "payload")
    val right = (1 to 100).map(i => (i.toLong, s"dim$i")).toDF("rk", "attr")
    val plain = left.join(right, left("k") === right("rk"))
      .select(col("k"), col("payload"), col("attr"))
    val salted = SkewJoin.saltedInnerJoin(left, "k", right, "rk", buckets = 8)
      .select(col("k"), col("payload"), col("attr"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads the hot key across buckets") {
    import spark.implicits._
    val left = (1 to 10000).map(i => (1L, s"v$i")).toDF("k", "payload")
    val salts = left.withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8L)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length == 8)
    assert(salts.map(_.getLong(1)).max < 10000L * 0.25) // no bucket dominates
  }

  test("results are invariant to shuffle partition count (determinism contract)") {
    // the oracle contract's core claim: decimal-accumulated aggregates,
    // hash-derived sampling, and sketch pipelines give bit-identical
    // results from any parallelism — so a 1000-executor run answers the
    // same bytes as the single-threaded DuckDB oracle
    val conf = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(conf)
    def run(): Seq[String] = Seq("q1_pricing_summary", "q43_moments",
        "dedup_minhash_lsh", "text_sample_per_group")
      .map(q => SparkEntry.queries(q)(spark, sf()).collect().mkString("|"))
    try {
      spark.conf.set(conf, "3")
      val a = run()
      spark.conf.set(conf, "17")
      val b = run()
      assert(a == b)
    } finally spark.conf.set(conf, before)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    import spark.implicits._ // tables land in the default ./spark-warehouse
    (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "a")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
    (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "b")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
    val j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    // disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(1200))
      assert(j.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("runtime bloom filter prunes the big side of a selective fact-fact join") {
    // Spark's runtime row-level filter: a selective filter on one join
    // side injects a bloom probe into the OTHER side's scan at runtime —
    // the big side drops non-joining rows before the shuffle. At 100 TB
    // this is the difference between shuffling the full fact table and
    // shuffling only the rows that can match. Thresholds are lowered so
    // the tiny fixture qualifies; results must be identical either way.
    import org.apache.spark.sql.functions._
    val l = graft.engine.Tables.load(spark, sf("0.01"), "lineitem")
    val o = graft.engine.Tables.load(spark, sf("0.01"), "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    def join() = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val before = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val withFilter = join()
      val p = withFilter.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"), p.take(1500))
      val expected = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        join().collect().map(r => (r.getString(0), r.getLong(1))).toSet
      }
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(withFilter.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == expected)
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("Materialize.release frees localCheckpoint blocks on the local path") {
    import spark.implicits._
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val staged = graft.engine.Materialize.stage(
      (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "payload"))
    val registered = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(registered.nonEmpty,
      "localCheckpoint should register its persisted RDD with the context")
    graft.engine.Materialize.release(staged)
    val leftover = (spark.sparkContext.getPersistentRDDs.keySet -- baseline)
      .intersect(registered)
    assert(leftover.isEmpty,
      s"release() left localCheckpoint blocks registered: $leftover (VERDICT r8)")
  }

  test("Materialize.sweep clears staged frames left live across a query") {
    import spark.implicits._
    graft.engine.Materialize.stage((1 to 100).toDF("n")) // no release site
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    graft.engine.Materialize.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("PPJoin prefix filter is exact: same pairs as the plain inverted-index join") {
    // dedup_ngram_prefix's bench slot is deferred to the 10× blowup
    // (SparkEntry.benchDeferred), so its equivalence claim — the prefix
    // filter drops CANDIDATES, never RESULT pairs — is pinned here
    import graft.ext.Dedup
    val plain = Dedup.ngramJaccardOn(
      spark.read.parquet(s"${sf()}/documents.parquet"))
    val pref = Dedup.ngramPrefixJaccardOn(
      spark.read.parquet(s"${sf()}/documents.parquet"))
    assert(pref.exceptAll(plain).isEmpty && plain.exceptAll(pref).isEmpty)
    graft.engine.Materialize.sweep(spark)
  }

  test("benchDeferred names exist and stay oracle-graded") {
    for (n <- SparkEntry.benchDeferred) {
      assert(SparkEntry.queries.contains(n), s"$n not a registered query")
      assert(SparkEntry.oracleSql.contains(n), s"$n lost its oracle entry")
    }
  }
}
