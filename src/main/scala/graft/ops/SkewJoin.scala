package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on by default) splits oversized shuffle
  * partitions, which covers most skew. This utility is for the residual
  * case AQE can't fix: a single join KEY so hot that one task would still
  * process it alone (AQE splits partitions, not keys, for aggregations
  * feeding the join or when the skewed side must build).
  *
  * Mechanics: the left (skewed) side gets a deterministic salt in
  * [0, buckets) derived from a hash of the whole row; the right side is
  * replicated `buckets` times with every salt value; the join key becomes
  * (key, salt) — spreading each hot key across `buckets` tasks. Cost:
  * right side shuffle volume × buckets, so use it with a small-ish right
  * side and only when a hot key is known/measured.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with the left side salted
    * across `buckets` partitions per key.
    */
  def saltedInnerJoin(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    // deterministic per-row salt: hash of all left columns (stable across
    // retries/partitionings — no rand(), which would break replayability)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
