package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Mergeable cardinality summaries (Apache DataSketches HLL, built into
  * Spark SQL) for INCREMENTAL corpus monitoring — the 100 TB answer to
  * "how many distinct tokens / documents does the corpus have now?"
  * after every ingest batch:
  *
  *  - sketch each batch once as it lands (one scan, a few KB of state
  *    per sketch — `lgK = 12` ⇒ ~1.6% relative standard error);
  *  - persist the per-batch sketch rows;
  *  - answer corpus-wide questions by UNIONING sketches — milliseconds
  *    over per-batch rows instead of a re-scan of every batch.
  *
  * Exact `count_distinct` over 100 TB is a full shuffle of every
  * distinct value; the sketches trade ~1% error for constant-size state
  * and lossless mergeability (union of part-sketches ≡ sketch of the
  * whole, a DataSketches guarantee).
  */
object Sketches {

  /** One-row frame: HLL sketch of DISTINCT TOKENS plus exact row/token
    * totals for the batch (the totals are cheap — they ride the same
    * scan as partial aggregates).
    */
  def tokenSketch(docs: DataFrame, textCol: String = "text",
                  lgK: Int = 12): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .agg(hll_sketch_agg(col("t"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_tokens"))

  /** One-row frame: HLL sketch of DISTINCT CONTENT FINGERPRINTS plus the
    * batch row count — `1 − estimate/n_docs` is the batch's exact-dup
    * rate without running the dedup itself.
    */
  def contentSketch(docs: DataFrame, textCol: String = "text",
                    lgK: Int = 12): DataFrame =
    docs.select(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(hll_sketch_agg(col("fp"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_docs"))

  /** Merge per-batch sketch rows into one corpus-wide sketch (additional
    * numeric columns are summed). Lossless: merging part sketches yields
    * the same estimator state as sketching the concatenated input.
    */
  def merge(sketches: DataFrame, sketchCol: String = "sketch"): DataFrame = {
    val numeric = sketches.schema.fields
      .filter(f => f.name != sketchCol && f.dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType])
      .map(f => sum(col(f.name)).as(f.name))
    sketches.agg(hll_union_agg(col(sketchCol)).as(sketchCol), numeric.toSeq: _*)
  }

  /** Estimated distinct count of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Count–min frequency estimates ([[graft.functions.CountMinSketch]]):
    * build ONE `depth × width` sketch over `rows` and attach `cms_n` —
    * the sketch's never-underestimating count — to every probe row.
    * NULL keys are excluded from the sketch (a NULL has no frequency
    * identity; callers decide their null policy upstream).
    *
    * Scale shape: the build is one aggregate pass whose partials merge
    * by counter addition (depth·width longs per task, independent of
    * row count); the probe side broadcasts the ONE-row sketch onto the
    * probe keys — a 1-row nested-loop by design, the cheapest possible
    * join — and evaluates `min_r counter[r][h_r(key)]` with codegen'd
    * `element_at`/`least` over the array column. At 100 TB the sketch
    * build reads every row once and ships kilobytes; the probe never
    * touches the raw rows again.
    */
  def cmsEstimates(
      rows: DataFrame,
      keyCol: Column,
      probes: DataFrame,
      probeKeyCol: String,
      depth: Int,
      width: Int
  ): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val keyed = rows.select(keyCol.cast("string").as("k"))
      .filter(col("k").isNotNull).as[String]
    val cms = graft.functions.CountMinSketch(depth, width)
    // __-prefixed internal name (repo convention): a probe frame with
    // its own `sketch` column must not collide with the broadcast side
    val sketchDf = keyed.select(cms.toColumn.name("__sketch")).toDF("__sketch")
    val est = (0 until depth).map { r =>
      element_at(col("__sketch"),
        (lit(r * width) +
          pmod(graft.functions.Hashing.md5Hash32(r, col(probeKeyCol).cast("string")),
            lit(width)) + 1).cast("int"))
    }.reduce(least(_, _))
    probes.crossJoin(broadcast(sketchDf))
      .withColumn("cms_n", est)
      .drop("__sketch")
  }
}
