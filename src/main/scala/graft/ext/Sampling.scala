package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs/engines; these
  * operators key the decision on a content hash, so the same row is
  * selected everywhere, every time — reproducible dataset splits, safe
  * re-runs, and cross-engine verifiability. Pure projections: zero
  * shuffle, linear at any scale.
  */
object Sampling {

  /** Hash of the key into [0, 10000) — basis points of the sample space. */
  private def bucket(keyCol: Column, seed: Int): Column =
    Hashing.md5Hash32(lit(seed), keyCol.cast("string")) % 10000

  /** Keep ~`fractionBp`/10000 of rows, decided by key hash (seeded). */
  def hashSample(df: DataFrame, keyCol: Column, fractionBp: Int, seed: Int = 1): DataFrame =
    df.filter(bucket(keyCol, seed) < fractionBp)

  /** The stratified-sample keep decision as a standalone boolean Column —
    * lets a pipeline carry the decision as a flag column (so one stats
    * aggregate covers every stage in a single pass, see
    * `jobs.CorpusCuration`) instead of filtering eagerly.
    * [[stratifiedHashSample]] is exactly `df.filter` of this expression.
    */
  def stratifiedKeepExpr(
      keyCol: Column,
      strataCol: Column,
      rates: Map[String, Int],
      defaultBp: Int = 0,
      seed: Int = 1
  ): Column = {
    val rateExpr = rates.foldLeft(lit(defaultBp)) { case (acc, (value, bp)) =>
      when(strataCol === value, lit(bp)).otherwise(acc)
    }
    bucket(keyCol, seed) < rateExpr
  }

  /** Per-stratum rates: `rates` maps stratum value → basis points; strata
    * not listed get `defaultBp`. The standard quality-weighted corpus
    * sampling shape (e.g. keep 100% of high-quality docs, 5% of the rest).
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      rates: Map[String, Int],
      defaultBp: Int = 0,
      seed: Int = 1
  ): DataFrame =
    df.filter(stratifiedKeepExpr(keyCol, strataCol, rates, defaultBp, seed))

  /** Mixture weighting: resample each source to its target weight, in
    * milli-multiples (1000 = keep as-is, 500 = downsample to half, 2500 =
    * upsample 2.5×). A row with weight w emits `w div 1000` full copies
    * plus one more with probability `(w mod 1000)/1000`, decided by the
    * key hash — the deterministic version of the per-source temperature /
    * mixture sampling every pretraining data pipeline runs. Output adds
    * `copy` (1-based repetition index) so downstream shuffling can spread
    * the copies. Pure projection + generator: zero shuffle, linear at any
    * scale.
    */
  def mixtureSample(
      df: DataFrame,
      keyCol: Column,
      sourceCol: Column,
      weightsMilli: Map[String, Int],
      defaultMilli: Int = 1000,
      seed: Int = 3
  ): DataFrame = {
    val wExpr = weightsMilli.foldLeft(lit(defaultMilli)) { case (acc, (value, w)) =>
      when(sourceCol === value, lit(w)).otherwise(acc)
    }
    df.withColumn("__n",
        (wExpr / 1000).cast("long") +
          when(bucket(keyCol, seed) < (wExpr % 1000) * 10, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** Per-key cap: keep at most `n` rows per key, selected by seeded
    * content-hash order — the per-source / per-domain document cap every
    * corpus-balancing pass applies (a few template-heavy domains
    * otherwise dominate a crawl). Hash ordering makes the kept set a
    * uniform deterministic n-subset per key — reproducible across runs,
    * engines, and partitionings; ties (hash collisions) break on the id
    * so the result is total-order stable. PRECONDITION: `idCol` is
    * unique per row (run dedup first) — duplicate (key, id) pairs get
    * identical sort keys, making which physical row survives the cap
    * partition-dependent.
    *
    * Scale shape: `row_number ≤ n` over the (key, hash) window is
    * rewritten by Spark's `InferWindowGroupLimit` into a PARTIAL
    * `WindowGroupLimit` before the shuffle and a FINAL one after — each
    * map task pre-prunes to n rows per key before anything ships, so a
    * hot key shuffles ~n·tasks rows, never its full group, and the
    * post-shuffle sort sees the pruned stream (spec-pinned plan). That
    * bounded-by-construction profile is why this stays a window and
    * does not need the groupBy-min reformulation the dedup family uses
    * for its (unbounded) window aggregates.
    */
  def capPerKey(df: DataFrame, keyCol: Column, idCol: Column, n: Int,
                seed: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy(Hashing.md5Hash32(lit(seed), idCol.cast("string")), idCol)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic train/validation/test split tag from the key hash.
    * Default seed differs from [[hashSample]]'s: with the same seed the
    * split would correlate with the sampling filter (every sampled row
    * would land in "train" — the buckets are the same numbers).
    */
  def splitTag(keyCol: Column, trainBp: Int = 9000, validBp: Int = 500, seed: Int = 2): Column = {
    val b = bucket(keyCol, seed)
    when(b < trainBp, "train")
      .when(b < trainBp + validBp, "valid")
      .otherwise("test")
  }
}
