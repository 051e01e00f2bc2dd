package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Telemetry

/** S6 — deterministic analog of the producer Lambda's workload generator
  * (SURVEY.md §2.1).
  *
  * The reference emits 99 records per invocation with
  * `sensor_id = str(randint(1,5))`, `temperature = randint(27,32)`,
  * `event_time = now().isoformat()` (`kfpLambdaStreamProducer.py:48-57`).
  * The engine version is seeded and distributed (`spark.range`, no driver
  * loop) so tests and benchmarks are reproducible.
  */
object TelemetryGenerator {
  val RecordsPerInvocation = 99 // kfpLambdaStreamProducer.py:48 range(1,100)

  /** Distributed batch generator with the producer's distributions. */
  def batch(spark: SparkSession, n: Long, startEpochSec: Long, seed: Long = 42L,
            recordsPerSecond: Double = 0.33): DataFrame =
    spark.range(n)
      .select(
        // randint(1,5) inclusive — 5 uniform keys (kfpLambdaStreamProducer.py:51)
        (floor(rand(seed) * 5) + 1).cast("long").cast("string").as("sensor_id"),
        // randint(27,32) inclusive (kfpLambdaStreamProducer.py:52)
        (floor(rand(seed + 1) * 6) + 27).cast("long").as("temperature"),
        // steady-state ~0.33 rec/s (99 per 300 s EventBridge schedule,
        // msk_flink_streaming_stack.py:223)
        timestamp_seconds(lit(startEpochSec) + (col("id") / recordsPerSecond))
          .as("event_time"))

  /** Streaming generator: the `rate` source mapped to the producer's
    * distributions — the unbounded analog of the Lambda's EventBridge
    * loop for load tests without a broker.
    */
  def rateStream(spark: SparkSession, rowsPerSecond: Int = 100): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        (pmod(col("value"), lit(5)) + 1).cast("string").as("sensor_id"),
        (pmod(col("value") * 31 + 7, lit(6)) + 27).cast("long").as("temperature"),
        col("timestamp").as("event_time"))

  /** In-memory rows for MemoryStream-based streaming tests. */
  def rows(n: Int, startEpochSec: Long, seed: Long = 42L): Seq[Telemetry] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      Telemetry(
        sensor_id = (rnd.nextInt(5) + 1).toString,
        temperature = (rnd.nextInt(6) + 27).toLong,
        event_time = new Timestamp((startEpochSec + (i * 3L)) * 1000L))
    }
  }
}
