package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Telemetry

class StreamJoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("stream-stream interval join matches keys within the time bound, evicts outside it") {
    val lMem = MemoryStream[Telemetry](spark)
    val rMem = MemoryStream[Telemetry](spark)
    val l = lMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("l_id"), col("event_time").as("l_time"))
    val r = rMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("r_id"), col("event_time").as("r_time"),
        col("temperature").as("r_temp"))
    val joined = StreamJoins.interval(l, r,
      col("l_id") === col("r_id"), col("l_time"), col("r_time"),
      "INTERVAL 0 SECONDS", "INTERVAL 30 SECONDS")

    val query = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    try {
      lMem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:00:00"))))
      rMem.addData(Seq(
        Telemetry("s1", 41, ts("2024-01-01 00:00:10")), // inside [0, 30s]
        Telemetry("s1", 42, ts("2024-01-01 00:01:10")), // outside
        Telemetry("s2", 43, ts("2024-01-01 00:00:10")))) // wrong key
      query.processAllAvailable()
      lMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:00"))))
      rMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:31"))))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("ssj_out").select("l_id", "r_temp")
      .as[(String, Long)].collect().toList
    assert(out == List(("s1", 41L)))
  }

  test("left-outer interval join emits unmatched left rows with nulls once the watermark finalizes them") {
    val lMem = MemoryStream[Telemetry](spark)
    val rMem = MemoryStream[Telemetry](spark)
    val l = lMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("l_id"), col("event_time").as("l_time"))
    val r = rMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("r_id"), col("event_time").as("r_time"),
        col("temperature").as("r_temp"))
    val joined = StreamJoins.intervalOuter(l, r,
      col("l_id") === col("r_id"), col("l_time"), col("r_time"),
      "INTERVAL 0 SECONDS", "INTERVAL 30 SECONDS")

    val query = joined.writeStream.format("memory")
      .queryName("ssoj_out").outputMode("append").start()
    try {
      lMem.addData(Seq(
        Telemetry("s1", 30, ts("2024-01-01 00:00:00")),   // will match
        Telemetry("s2", 30, ts("2024-01-01 00:00:00")))) // never matches
      rMem.addData(Seq(Telemetry("s1", 41, ts("2024-01-01 00:00:10"))))
      query.processAllAvailable()
      // push BOTH watermarks far past s2's interval upper edge so the
      // engine can finalize "no match" and emit the null-side row
      lMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:00"))))
      rMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:00"))))
      query.processAllAvailable()
      lMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:20:00"))))
      rMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:20:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("ssoj_out").select("l_id", "r_temp")
      .as[(String, Option[Long])].collect().toSet
    assert(out.contains(("s1", Some(41L))), s"matched row missing: $out")
    assert(out.contains(("s2", None)), s"null-side row missing: $out")
  }

  test("right-outer interval join emits unmatched right rows with nulls once finalized") {
    val lMem = MemoryStream[Telemetry](spark)
    val rMem = MemoryStream[Telemetry](spark)
    val l = lMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("l_id"), col("event_time").as("l_time"))
    val r = rMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("r_id"), col("event_time").as("r_time"),
        col("temperature").as("r_temp"))
    val joined = StreamJoins.intervalRightOuter(l, r,
      col("l_id") === col("r_id"), col("l_time"), col("r_time"),
      "INTERVAL 0 SECONDS", "INTERVAL 30 SECONDS")

    val query = joined.writeStream.format("memory")
      .queryName("ssroj_out").outputMode("append").start()
    try {
      lMem.addData(Seq(Telemetry("s1", 30, ts("2024-01-01 00:00:00"))))
      rMem.addData(Seq(
        Telemetry("s1", 41, ts("2024-01-01 00:00:10")),   // matches
        Telemetry("s2", 42, ts("2024-01-01 00:00:10"))))  // never matches
      query.processAllAvailable()
      // advance both watermarks far enough to finalize s2's "no match"
      lMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:00"))))
      rMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:00"))))
      query.processAllAvailable()
      lMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:20:00"))))
      rMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:20:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("ssroj_out").select("r_id", "r_temp", "l_id")
      .as[(String, Long, Option[String])].collect().toSet
    assert(out.contains(("s1", 41L, Some("s1"))), s"matched row missing: $out")
    assert(out.contains(("s2", 42L, None)), s"null-left row missing: $out")
  }

  test("full-outer interval join surfaces both sides' unmatched rows") {
    val lMem = MemoryStream[Telemetry](spark)
    val rMem = MemoryStream[Telemetry](spark)
    val l = lMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("l_id"), col("event_time").as("l_time"))
    val r = rMem.toDF().withWatermark("event_time", "5 seconds")
      .select(col("sensor_id").as("r_id"), col("event_time").as("r_time"),
        col("temperature").as("r_temp"))
    val joined = StreamJoins.intervalFullOuter(l, r,
      col("l_id") === col("r_id"), col("l_time"), col("r_time"),
      "INTERVAL 0 SECONDS", "INTERVAL 30 SECONDS")

    val query = joined.writeStream.format("memory")
      .queryName("ssfoj_out").outputMode("append").start()
    try {
      lMem.addData(Seq(
        Telemetry("s1", 30, ts("2024-01-01 00:00:00")),   // matches
        Telemetry("s3", 30, ts("2024-01-01 00:00:00")))) // left-only
      rMem.addData(Seq(
        Telemetry("s1", 41, ts("2024-01-01 00:00:10")),
        Telemetry("s2", 42, ts("2024-01-01 00:00:10")))) // right-only
      query.processAllAvailable()
      lMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:00"))))
      rMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:10:00"))))
      query.processAllAvailable()
      lMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:20:00"))))
      rMem.addData(Seq(Telemetry("s9", 30, ts("2024-01-01 00:20:00"))))
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("ssfoj_out")
      .select("l_id", "r_id", "r_temp")
      .as[(Option[String], Option[String], Option[Long])].collect().toSet
    assert(out.contains((Some("s1"), Some("s1"), Some(41L))), s"inner row missing: $out")
    assert(out.contains((Some("s3"), None, None)), s"left-only row missing: $out")
    assert(out.contains((None, Some("s2"), Some(42L))), s"right-only row missing: $out")
  }

  test("stream-static enrich: broadcast dimension lookup, unmatched keys survive with nulls") {
    val dim = Seq(("s1", "lab"), ("s2", "roof")).toDF("sensor_id", "location")
    val mem = MemoryStream[Telemetry](spark)
    val enriched = StreamJoins.enrich(mem.toDF(), dim, Seq("sensor_id"))
    val query = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData(Seq(
        Telemetry("s1", 30, ts("2024-01-01 00:00:00")),
        Telemetry("s3", 31, ts("2024-01-01 00:00:01")))) // no dim row
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.table("enrich_out").select("sensor_id", "location")
      .as[(String, Option[String])].collect().toMap
    assert(out == Map("s1" -> Some("lab"), "s3" -> None))
  }
}
