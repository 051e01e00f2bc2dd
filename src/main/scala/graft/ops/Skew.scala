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

  /** EXACT count(DISTINCT value) per key, salted — the aggregate the
    * random-salt family above can't serve: distinct is not algebraic
    * under an arbitrary split, so the salt here is the VALUE's hash,
    * `pmod(hash(value), buckets)`. Equal values land in the same
    * bucket by construction, so per-(key, bucket) distinct counts
    * partition the key's distinct set and their SUM is exact — no
    * randomness, no approximation, and the replay is deterministic.
    *
    * This is the 100 TB shape for "distinct users of the one hot
    * event": a plain `count(DISTINCT)` funnels the hot key's whole
    * value set through one reducer; here it spreads over `buckets`
    * reducers, each deduplicating only its hash slice. NULL values
    * are ignored (SQL `count(DISTINCT)` semantics) but their KEYS are
    * kept — an all-NULL key still reports `n_distinct = 0`, exactly
    * like a plain GROUP BY would (Spark's `hash` maps NULL to its
    * seed, so those rows ride one ordinary bucket with a 0 partial);
    * NULL keys form their own group like any GROUP BY.
    */
  def saltedDistinct(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__v", valueCol)
      .withColumn("__salt", pmod(hash(col("__v")), lit(saltBuckets)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(countDistinct(col("__v")).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}
