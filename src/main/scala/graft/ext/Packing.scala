package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget bins (context windows) deterministically.
  *
  * Strategy is contiguous next-fit with overflow tolerance: documents are
  * taken in a deterministic order within each group, and a document's bin
  * is `floor(tokens-before-it / capacity)` — the running total never
  * resets, so a bin may overflow its capacity by at most one document
  * (equivalently: each document starts in the bin where the token budget
  * stood). This is the window-function-expressible packing strategy: one
  * shuffle (the per-group sort), no sequential state, identical results on
  * any engine — where exact next-fit (reset on overflow) is inherently
  * sequential per group and needs `mapGroups`/recursion. At 100 TB the
  * group key should include a shard component (e.g. `(lang, hash(id) %
  * nShards)`) so no single ordered partition exceeds executor memory;
  * packing quality is unaffected because bins never span shards.
  */
object Packing {

  /** Per-document bin assignment: adds `bin` (0-based within the group)
    * and `tok_before` (the running token total the bin boundary was
    * computed from).
    */
  def assignBins(
      docs: DataFrame,
      groupCol: Column,
      orderCol: Column,
      tokensCol: Column,
      capacity: Long
  ): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("tok_before", coalesce(sum(tokensCol).over(w), lit(0L)))
      .withColumn("bin", floor(col("tok_before") / capacity).cast("long"))
  }

  /** Per-bin packing summary: documents per bin and total tokens per bin
    * (the overflow-tolerance contract means `sum_tokens` may exceed
    * `capacity` by less than one document's tokens).
    */
  def packSummary(
      docs: DataFrame,
      groupCol: Column,
      orderCol: Column,
      tokensCol: Column,
      capacity: Long
  ): DataFrame =
    assignBins(docs, groupCol, orderCol, tokensCol, capacity)
      .groupBy(groupCol.as("grp"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("sum_tokens"))
}
