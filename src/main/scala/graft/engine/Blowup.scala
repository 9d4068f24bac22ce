package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-blowup generator for empirical scaling measurement
  * (`SPARK_GRAFT_BLOWUP=N` in graft.Bench): materializes an N× copy of
  * the testdata where each FACT table is the union of N key-shifted
  * copies, then the ordinary bench runs against it. The point is to
  * measure how each operator's runtime grows with input size — so every
  * transform below is chosen to multiply the WORKLOAD linearly without
  * changing its structure:
  *
  *  - `documents`: doc_id shifted; every token gets a copy-unique prefix
  *    (copy 0 untouched), so shingle/minhash/simhash similarity within a
  *    copy is identical to the original corpus while CROSS-copy Jaccard
  *    is 0 — without this, N identical texts per doc would make the
  *    near-dup pair graph grow quadratically in N (a different workload,
  *    not a bigger one).
  *  - `embeddings`: vec_id shifted; vectors circularly rotated by `copy`
  *    positions — rotation preserves all inner products within a copy
  *    addend-for-addend (same ANN/near-dup geometry) while cross-copy
  *    cosines decorrelate (validated ≤ 0.30 < τ by BlowupSpec). Because
  *    rotation by `copy % 64` is the identity whenever copy ≡ 0 (mod 64),
  *    the factor is CAPPED at 64 (`require` below, ADVICE r3): copies 64
  *    apart would correlate perfectly and the cos≥τ pair workload would
  *    go quadratic. No signed-permutation family can do better pairwise —
  *    any relative transform between two of ≥65 copies repeats modulo the
  *    permutation group's cycle structure, and sign flips alone cannot
  *    decorrelate vectors whose energy concentrates on few dims (measured
  *    cross-copy cos 0.69 on this corpus). 64 copies ≈ 6.4 TB of blown
  *    sf0.1 — far past what a single-node scaling measurement needs.
  *  - `events`: event_id shifted; ts shifted by `copy` years, so session
  *    / window / retention structure repeats per copy instead of packing
  *    N duplicate events into every timestamp.
  *  - `orders`/`lineitem`: orderkeys shifted by the same stride, so the
  *    order↔lineitem join multiplies linearly and per-order line counts
  *    are unchanged. Dimension keys (custkey, partkey, nation…) are NOT
  *    shifted: dims stay fixed, as they do at real scale.
  *
  * Output is cached under /tmp and keyed by (source, N); a _BLOWUP_DONE
  * marker makes repeat bench runs reuse it.
  */
object Blowup {

  private val Stride = 1000000000L
  private val YearNanos = 31536000L * 1000000000L

  def materialize(spark: SparkSession, srcDir: String, n: Int): String = {
    require(n >= 1 && n <= 64,
      s"blowup factor $n outside [1, 64]: embedding copies rotate by copy % 64, " +
        "so copies 64 apart would correlate perfectly and break the generator's " +
        "linear-workload invariant for the cos-threshold families (ADVICE r3)")
    val name = srcDir.replaceAll(".*/", "")
    val out = s"/tmp/graft_blowup_${name}_x$n"
    // set before the cache early-return: callers uniformly get a session
    // that can read the nanos-timestamped SOURCE events after this call
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val done = java.nio.file.Paths.get(out, "_BLOWUP_DONE")
    if (java.nio.file.Files.exists(done)) return out
    Tables.all.foreach { t =>
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      val blown =
        if (Tables.dims(t)) src
        else (0 until n).map(c => copyOf(t, src, c)).reduce(_ unionByName _)
      blown.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    java.nio.file.Files.createFile(done)
    out
  }

  private def copyOf(table: String, df: DataFrame, c: Int): DataFrame = {
    if (c == 0) return df
    val shift = lit(c * Stride)
    table match {
      case "documents" =>
        df.withColumn("doc_id", col("doc_id") + shift)
          .withColumn("text",
            expr(s"array_join(transform(split(text, ' '), w -> concat('c$c', w)), ' ')"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" =>
        val r = c % 64 // c ≤ 63 by the materialize() cap; % keeps this total
        df.withColumn("vec_id", col("vec_id") + shift)
          .withColumn("embedding",
            expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))"))
      case "events" =>
        // ts shift honors both generator vintages: raw INT64 nanos add a
        // nanos constant; native timestamps add the same span as an interval
        val tsShift = df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => col("ts") + lit(c * YearNanos)
          case _ => col("ts") + expr(s"make_dt_interval(${c * 365L}, 0, 0, 0)")
        }
        df.withColumn("event_id", col("event_id") + shift)
          .withColumn("ts", tsShift)
      case "orders" =>
        df.withColumn("o_orderkey", col("o_orderkey") + shift)
      case "lineitem" =>
        df.withColumn("l_orderkey", col("l_orderkey") + shift)
      case _ => df
    }
  }
}
