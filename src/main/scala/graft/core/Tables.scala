package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** NOTE: like [[events]]' nanosAsLong precedent, this mutates the
    * SESSION-WIDE conf `spark.sql.parquet.inferTimestampNTZ.enabled=false`
    * as a side effect — any later `spark.read.parquet` in the same session
    * (graft's or the caller's own) reads naive timestamp[us] as TIMESTAMP,
    * not TIMESTAMP_NTZ. It is set on EVERY call (not just plan-cache
    * misses) so cached and fresh loads leave identical session state; a
    * caller that needs NTZ semantics for its own reads must flip the conf
    * back after calling graft and before its own read.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's parquet stores naive timestamp[us] (no UTC
    // adjustment). Read those as session-TZ TIMESTAMP — not
    // TIMESTAMP_NTZ — so timestamp arithmetic (unix_micros, interval
    // subtraction vs TIMESTAMP literals) resolves, matching the DuckDB
    // oracle's naive read under the UTC sessions every entrypoint
    // pins. Done by conf at the scan (not a cast above it) so filter
    // pushdown on timestamp columns survives.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    planCache.computeIfAbsent(
      (System.identityHashCode(spark), s"$dir/$name.parquet"),
      key => spark.read.parquet(key._2))
  }

  /** `events.ts` has shipped in two physical flavors: parquet
    * TIMESTAMP(NANOS) — unreadable as a Spark timestamp
    * (PARQUET_TYPE_ILLEGAL), so the legacy conf reads raw nanos and
    * [[normalizeTs]] truncates to micros — and naive timestamp[us], which
    * [[load]]'s NTZ-inference conf already surfaces as TIMESTAMP.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  /** Normalize an event-time column to session-TZ TIMESTAMP regardless of
    * the physical flavor it was read as: raw nanos LONG (legacy conf) is
    * integer-divided to micros — double math would lose precision above
    * 2^53 ns — and TIMESTAMP_NTZ (a reader that skipped [[load]]'s conf)
    * is wall-clock cast. Works on batch and streaming frames alike.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
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
