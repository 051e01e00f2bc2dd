package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class ObservabilitySpec extends SparkTestBase {
  import spark.implicits._

  test("withHealthMetrics: per-batch observed metrics ride the streaming query") {
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val observed = Observability.withHealthMetrics(
      mem.toDS().toDF("id", "event_time"), col("event_time"))
    val query = observed.writeStream.format("memory")
      .queryName("obs_out").outputMode("append").start()
    try {
      mem.addData(Seq(
        (1L, ts("2024-01-01 00:00:00")),
        (2L, null.asInstanceOf[java.sql.Timestamp]),
        (3L, ts("2024-01-01 00:05:00"))))
      query.processAllAvailable()
      val m = query.lastProgress.observedMetrics.get("graft_health")
      assert(m != null, "observed metrics must appear in the progress")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("n_null_ts") == 1L)
      assert(m.getAs[Long]("max_event_sec") ==
        ts("2024-01-01 00:05:00").getTime / 1000)
      // the metrics are a CollectMetrics plan node, not a second query:
      // the sink still receives every row
      assert(spark.table("obs_out").count() == 3L)
    } finally query.stop()
  }
}
