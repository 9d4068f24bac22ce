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
  *    (same ANN/near-dup geometry) while cross-copy cosines decorrelate
  *    (near-orthogonal synthetic vectors), avoiding the same quadratic
  *    explosion at cos≥τ.
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
    val name = srcDir.replaceAll(".*/", "")
    val out = s"/tmp/graft_blowup_${name}_x$n"
    val done = java.nio.file.Paths.get(out, "_BLOWUP_DONE")
    if (java.nio.file.Files.exists(done)) return out
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
        val r = c % 64
        df.withColumn("vec_id", col("vec_id") + shift)
          .withColumn("embedding",
            expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))"))
      case "events" =>
        df.withColumn("event_id", col("event_id") + shift)
          .withColumn("ts", col("ts") + lit(c * YearNanos))
      case "orders" =>
        df.withColumn("o_orderkey", col("o_orderkey") + shift)
      case "lineitem" =>
        df.withColumn("l_orderkey", col("l_orderkey") + shift)
      case _ => df
    }
  }
}
