package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.ops.SensorOps

/** Drained-stream ≡ batch equivalence (SURVEY.md §1.4): running Q1 as a
  * file stream over the same parquet and draining it yields exactly the
  * batch result, restricted to windows the final watermark has closed
  * (windows ending after max_ts − delay stay in state by design).
  */
class StreamBatchParitySpec extends SparkTestBase {
  import spark.implicits._

  test("Q1 streamed over events parquet (availableNow) equals batch result for closed windows") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)

    // file source wants a directory; stage the parquet in one, and stream
    // with the RAW schema + the same ts normalization Tables.events
    // applies (nanos-long and naive-us flavors both occur; TESTDATA.md)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stageDir = Files.createTempDirectory("graft_parity_in_")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      stageDir.resolve("events.parquet"))
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema

    val streamed = Tables.normalizeTs(
        spark.readStream.schema(rawSchema).parquet(stageDir.toString))
      .withWatermark("ts", "5 seconds")

    val alerts = SensorOps.alertsStreaming(streamed,
      keyCol = "user_id", valueCol = "value", tsCol = "ts",
      windowLen = "1 day", threshold = 30, minCount = 3)

    val chk = Files.createTempDirectory("graft_parity_").toString
    val query = alerts.writeStream.format("memory").queryName("parity_out")
      .option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val maxTs = events.agg(max(col("ts"))).collect().head.getTimestamp(0).getTime
    val watermark = maxTs - 5000L

    val batch = SensorOps.alerts(events,
        keyCol = "user_id", valueCol = "value", tsCol = "ts",
        windowLen = "1 day", threshold = 30, minCount = 3)
      .filter(unix_timestamp(col("start_event_time")) * 1000L + 86400000L <= watermark)
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet

    val stream = spark.table("parity_out")
      .as[(Long, Long, java.sql.Timestamp)].collect().toSet

    assert(batch.nonEmpty, "fixture must produce closed-window alerts")
    assert(stream == batch,
      s"drained stream must equal batch on closed windows; stream=${stream.size} batch=${batch.size}")
  }

  test("near-dup: drained stream hit ids equal the batch LSH candidate ids") {
    import graft.ext.Dedup
    import graft.streaming.StatefulOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // batch candidates: every doc that shares a band bucket with a
    // SMALLER id — exactly the ids minhashPairs emits on the larger side
    val batchHitIds = Dedup.minhashPairs(docs)
      .select(col("id_b")).distinct().as[Long].collect().toSet

    // stage the corpus as ONE parquet file with a synthetic event time:
    // availableNow then drains it in a single micro-batch, within which
    // the detector is arrival-order independent (it sorts each band
    // group by id). TTL far beyond the (constant) event-time span.
    val stageDir = Files.createTempDirectory("graft_ndparity_in_").toString
    docs.withColumn("event_time",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .coalesce(1).write.mode("overwrite").parquet(stageDir)
    val schema = spark.read.parquet(stageDir).schema

    val hits = StatefulOps.nearDupHits(
      spark.readStream.schema(schema).parquet(stageDir), ttlMs = 86400000L)
    val chk = Files.createTempDirectory("graft_ndparity_chk_").toString
    val query = hits.writeStream.format("memory").queryName("ndparity_out")
      .option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val streamHitIds = spark.table("ndparity_out")
      .select(col("id")).distinct().as[Long].collect().toSet
    assert(batchHitIds.nonEmpty, "fixture must contain near-dup candidates")
    assert(streamHitIds == batchHitIds,
      s"stream=${streamHitIds.size} batch=${batchHitIds.size}; " +
        s"onlyStream=${(streamHitIds -- batchHitIds).take(5)} " +
        s"onlyBatch=${(batchHitIds -- streamHitIds).take(5)}")
  }
}
