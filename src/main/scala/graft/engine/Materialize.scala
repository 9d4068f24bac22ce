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

  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption("spark.graft.reliableMaterialize")
      .map(_.toBoolean)
      .getOrElse(!spark.sparkContext.isLocal)
    if (reliable) {
      val p = df.persist(StorageLevel.DISK_ONLY_2)
      p.count() // eager, like localCheckpoint(true)
      p
    } else df.localCheckpoint(true)
  }
}
