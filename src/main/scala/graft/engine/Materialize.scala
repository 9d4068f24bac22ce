package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization points for frames that branch 2–4 ways (shingle sets,
  * tf tables, propagation-loop state): without one, Spark recomputes the
  * full upstream plan per branch / per round.
  *
  * `localCheckpoint(true)` is the fast choice but stores blocks
  * NON-replicated in executor storage and truncates lineage — on a real
  * cluster an executor loss makes the frame unrecoverable and fails the
  * job. So: local mode → eager localCheckpoint; distributed (or
  * `spark.graft.reliableMaterialize=true` to force either way) →
  * replicated disk persist, eagerly materialized, which survives a lost
  * executor at the cost of one disk write.
  */
object Materialize {

  private def reliable(df: DataFrame): Boolean = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.reliableMaterialize")
      .map(_.toBoolean)
      .getOrElse(!spark.sparkContext.isLocal)
  }

  def stage(df: DataFrame): DataFrame =
    if (reliable(df)) {
      val p = df.persist(StorageLevel.DISK_ONLY_2)
      p.count() // eager, like localCheckpoint(true)
      p
    } else df.localCheckpoint(true)

  /** Drop a staged frame that has been SUPERSEDED (iterative loops stage a
    * new state frame per round — without this the reliable path accumulates
    * DISK_ONLY_2 blocks across rounds and repeated calls, ADVICE r3).
    *
    * Unconditional: `Dataset.unpersist` goes through the CacheManager, and a
    * localCheckpoint frame's blocks live only at the RDD layer (never
    * registered with the CacheManager), so on the local path this is a
    * harmless no-op — the checkpointed blocks stay put and are reclaimed by
    * the ContextCleaner on GC. Re-reading `spark.graft.reliableMaterialize`
    * here instead would silently skip the unpersist if the conf flipped
    * between stage() and release() (ADVICE r4).
    *
    * Caller contract: pass the EXACT frame returned by [[stage]] — unpersist
    * is non-cascading and only removes cache entries whose plan is
    * `sameResult` with the frame given, so a projection over the staged
    * frame (e.g. `staged.drop(...)`) never matches (ADVICE r4).
    */
  def release(df: DataFrame): Unit =
    df.unpersist(blocking = false)
}
