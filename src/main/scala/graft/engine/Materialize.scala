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
    * Only acts on the persist path: a localCheckpoint frame's lineage is
    * truncated, so unpersisting it would make the data unrecoverable if the
    * frame is ever re-read; its blocks are instead reclaimed by the
    * ContextCleaner when the RDD is garbage-collected.
    */
  def release(df: DataFrame): Unit =
    if (reliable(df)) df.unpersist(blocking = false)
}
