package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the "what changed between these two loads"
  * audit that every warehouse migration, backfill sign-off, and vendor
  * re-delivery needs. Unlike `jobs.AggMaintenance.changes` (which diffs
  * the engine's own maintained state), this diffs ANY two keyed
  * snapshots and reports column-LEVEL provenance: not just that a row
  * changed, but which columns moved.
  */
object Reconcile {

  /** Keyed diff of two snapshots: one row per key that differs, with
    * `op` ∈ insert (key only in `after`) / delete (only in `before`) /
    * update (present in both, some compared column differs null-safely),
    * and `changed_cols` — the differing column names joined with "," in
    * `compareCols` declaration order (NULL for insert/delete, where
    * "every column changed" carries no information). Keys present in
    * both snapshots with all compared columns equal are filtered out.
    *
    * Comparison is null-safe (`<=>`): NULL → value and value → NULL are
    * changes, NULL → NULL is not. Compared columns should be exact
    * types (BIGINT fixed-point for money) — a double column compares by
    * IEEE bit equality, which is deterministic but rarely what a
    * reconciliation wants.
    *
    * Scale shape: one full-outer shuffle join on the keys and a
    * map-side projection — the same cost as the row-level diff;
    * `changed_cols` is pure expression work (concat_ws skips the
    * NULL arms, so no array materialization survives codegen).
    * Duplicate keys in either snapshot are the caller's bug; the join
    * would multiply them (audit with a count-distinct gate first).
    */
  def tableDiff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]
  ): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty,
      "need at least one key and one compared column")
    val b = compareCols.foldLeft(
        before.select((keys ++ compareCols).map(col): _*))(
        (d, c) => d.withColumnRenamed(c, s"__b_$c"))
      .withColumn("__b_present", lit(true))
    val a = compareCols.foldLeft(
        after.select((keys ++ compareCols).map(col): _*))(
        (d, c) => d.withColumnRenamed(c, s"__a_$c"))
      .withColumn("__a_present", lit(true))
    val differs = compareCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c"))).reduce(_ || _)
    val changed = concat_ws(",",
      compareCols.map(c =>
        when(!(col(s"__b_$c") <=> col(s"__a_$c")), lit(c))): _*)
    b.join(a, keys, "full_outer")
      .withColumn("op",
        when(col("__b_present").isNull, lit("insert"))
          .when(col("__a_present").isNull, lit("delete"))
          .when(differs, lit("update")))
      .filter(col("op").isNotNull)
      .withColumn("changed_cols",
        when(col("op") === "update", changed))
      .select(keys.map(col) ++ Seq(col("op"), col("changed_cols")): _*)
  }
}
