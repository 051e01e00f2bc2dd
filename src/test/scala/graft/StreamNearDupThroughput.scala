package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulOps

/** Streaming near-dup throughput probe (dev tool):
  * `Test/runMain graft.StreamNearDupThroughput [nDocs]` — writes a
  * synthetic corpus (10% exact dups of the prior doc) to parquet, then
  * drains it through `StatefulOps.nearDupHits` with an availableNow
  * file-source stream and reports docs/sec end to end (signature +
  * band shuffle + keyed state).
  */
object StreamNearDupThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("neardup_tput").toString
    def words(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 55).map(i =>
        concat(lit("w"), pmod(hash(id, lit(i)), lit(5000)).cast("string"))): _*)
    spark.range(n.toLong).select(
        col("id").as("doc_id"),
        when(col("id") % 10 === 0 && col("id") > 0, words(col("id") - 1))
          .otherwise(words(col("id"))).as("text"),
        timestamp_seconds(lit(1700000000L) + col("id") / 1000).as("event_time"))
      .write.mode("overwrite").parquet(s"$dir/corpus")

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, event_time TIMESTAMP")
      .parquet(s"$dir/corpus")
    val t0 = System.nanoTime()
    val query = StatefulOps.nearDupHits(stream, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("tput_hits")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    query.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val hits = spark.table("tput_hits").select(countDistinct(col("id"))).head.getLong(0)
    println(f"[neardup-stream] $n docs in $sec%.2f s = ${n / sec}%.0f docs/s, " +
      f"flagged $hits distinct near-dup docs")
    spark.stop()
  }
}
