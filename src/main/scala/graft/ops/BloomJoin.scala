package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi join — the standard big-join reduction
  * when the probe side is huge and the build side's KEY SET is small
  * enough to sketch but too large (or the join too selective) to pay a
  * full shuffle of the probe side.
  *
  * Shape: build a Bloom filter over the build side's keys (one pass over
  * the small side, sketch collected to the driver — exactly how Spark's
  * own runtime row-group filters ship), broadcast it inside a predicate
  * that drops probe rows whose key cannot match, then run the exact semi
  * join over the survivors. False positives only cost work — the final
  * join removes them — so the RESULT is exactly the plain semi join at a
  * fraction of the shuffle volume. At 100 TB this is the difference
  * between shuffling the full fact table and shuffling the ~matching
  * slice.
  */
object BloomJoin {

  /** `left SEMI JOIN right ON left(leftKey) = right(rightKey)` with a
    * Bloom pre-filter on the probe (left) side. `expectedItems`/`fpp`
    * size the sketch; correctness never depends on them.
    */
  def semiJoin(left: DataFrame, leftKey: String, right: DataFrame, rightKey: String,
               expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // an EMPTY build side gives stat.bloomFilter a null buffer (NPE on
    // first probe) — and the semi join against nothing is empty anyway;
    // the limit(1) probe is one cheap job before the build-side scan
    if (right.select(col(rightKey)).limit(1).isEmpty) return left.limit(0)
    val bloom = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    // boxed Long, not Long: a NULL probe key must drop (like the equi
    // join will anyway), not NPE inside the UDF's unboxing
    val mightContain = udf((k: java.lang.Long) => k != null && bloom.mightContainLong(k))
    left.filter(mightContain(col(leftKey)))
      .join(right.select(col(rightKey)), col(leftKey) === col(rightKey), "left_semi")
  }
}
