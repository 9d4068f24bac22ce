package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Events

/** Structured Streaming twins must agree with their batch forms: run the
  * streaming pipeline with Trigger.AvailableNow into a memory sink and
  * compare against the batch query on the same files.
  */
class StreamingSpec extends SparkSpecBase {

  /** The file stream source needs a directory; stage the single events
    * parquet file into one.
    */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf()}/events.parquet"),
      d.resolve("part-0.parquet"))
    d.toString
  }

  test("streaming windowed counts == batch windowed counts (sf0.001)") {
    val q = Events.streamingWindowedCounts(spark, eventsDir)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_counts").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Events.windowedCounts(spark, sf()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("mapGroupsWithState per-user stats == batch groupBy on final state") {
    val q = Events.streamingUserStats(spark, eventsDir)
      .writeStream.format("memory").queryName("user_stats")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last update per user is the final state
    val streamed = spark.table("user_stats")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.engine.Tables.load(spark, sf(), "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionize matches batch session_window (closed sessions)") {
    import org.apache.spark.sql.functions._
    val q = Events.streamingSessionize(spark, eventsDir)
      .writeStream.format("memory").queryName("fmgs_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("fmgs_sessions")
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    // Batch truth. Every streamed session must match a batch session
    // exactly; the only sessions allowed to be missing from the stream
    // are each user's final one (it may stay open in state if the last
    // watermark didn't pass its gap — timeout firing depends on how
    // AvailableNow advances the watermark).
    val batch = Events.sessionize(spark, sf())
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val batchSet = batch.toSet
    val lastPerUser = batch.groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).max) }.toSet
    val missing = batchSet -- streamed
    assert((streamed -- batchSet).isEmpty,
      s"streamed sessions not in batch truth: ${(streamed -- batchSet).take(5)}")
    assert(missing.forall(x => lastPerUser.contains((x._1, x._2))),
      s"non-final sessions missing from stream: ${missing.filterNot(x => lastPerUser.contains((x._1, x._2))).take(5)}")
    assert(streamed.size >= batchSet.size - lastPerUser.size)
  }

  test("stream-stream interval join (purchase attribution) == batch join") {
    val q = Events.streamingPurchaseAttribution(spark, eventsDir)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("attrib")
      .select("event_id", "click_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val batch = Events.batchPurchaseAttribution(spark, sf())
      .select("event_id", "click_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("foreachBatch sink: deduped micro-batches land in parquet (custom-sink pattern)") {
    import org.apache.spark.sql.{DataFrame, Row, Dataset}
    val out = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val q = Events.streamingDedup(spark, eventsDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // the escape hatch to any batch sink; append is safe here because
        // dropDuplicatesWithinWatermark emits each event_id once
        batch.write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val landed = spark.read.parquet(out).select("event_id").distinct().count()
    val expected = graft.engine.Tables.load(spark, sf(), "events")
      .select("event_id").distinct().count()
    assert(landed == expected)
  }

  test("streaming dedup within watermark preserves distinct event count") {
    val q = Events.streamingDedup(spark, eventsDir)
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("deduped").count()
    val batchDistinct = graft.engine.Tables.load(spark, sf(), "events")
      .dropDuplicates("event_id").count()
    assert(streamed == batchDistinct)
  }
}
