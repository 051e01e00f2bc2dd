package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregations (SURVEY.md §7.4 item 8).
  *
  * AQE handles skewed *joins* at runtime; skewed *aggregations* on a hot
  * key are pre-split here: add a random salt, aggregate (key, salt)
  * partially, then merge per key. Two shuffles, but the first spreads a
  * hot key over `saltBuckets` reducers — the standard trade once one key
  * exceeds what a single task should hold. Only algebraic aggregates
  * (count/sum/min/max) merge losslessly this way.
  */
object Skew {

  /** count(*) per key, salted. Result is identical to a plain
    * `groupBy(keys).count()` — salting only changes the shuffle layout.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltBuckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", (rand(7L) * saltBuckets).cast("int"))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("count"))
  }

  /** sum(valueCol) per key, salted. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                saltBuckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", (rand(7L) * saltBuckets).cast("int"))
      .withColumn("__v", valueCol)
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("sum"))
  }

  /** count(*) AND sum(valueCol) per key in ONE salted pass — half the
    * scans/shuffles of running [[saltedCount]] + [[saltedSum]] separately,
    * and no key-equality join between them (a plain join would drop a
    * NULL-keyed group that GROUP BY retains).
    */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", (rand(7L) * saltBuckets).cast("int"))
      .withColumn("__v", valueCol)
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__pn"), sum(col("__v")).as("__ps"))
      .groupBy(keys: _*)
      .agg(sum(col("__pn")).as("n"), sum(col("__ps")).as("sum"))
  }
}
