package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's parquet corpus (TESTDATA.md).
  *
  * Tables are plain parquet directories under a scale-factor dir; at 100 TB
  * these become partitioned/bucketed external tables — the loader is the
  * single seam where that swap happens, so no query code changes.
  */
object Tables {

  /** Plan cache: `spark.read.parquet` builds a fresh file index (listing
    * + footer read) on every call, which the 68-query harness pays per
    * query. Caching the analyzed DataFrame per (session, path) removes
    * that fixed cost — the metadata-caching role a catalog/metastore
    * plays in production. Keyed on the session's identity so a stopped
    * session's plans are never reused by a new one.
    */
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    planCache.computeIfAbsent(
      (System.identityHashCode(spark), s"$dir/$name.parquet"),
      key => spark.read.parquet(key._2))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read as a
    * timestamp (PARQUET_TYPE_ILLEGAL). Read it as raw nanos (legacy conf,
    * runtime-settable) and truncate to microseconds with integer division —
    * double math would lose precision above 2^53 ns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
