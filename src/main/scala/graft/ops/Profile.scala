package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the audit table a pipeline publishes before
  * anyone trains on (or joins against) a freshly landed corpus: per-column
  * null counts, distinct cardinality and value range, one row per column.
  * The reference pipeline has no profiling stage (its schema is 3 fixed
  * columns, `PythonKafkaSink/main.py:14-18`); at 100 TB a profile is the
  * first gate every ingest runs, so it is first-class here.
  *
  * Scale shape: ONE aggregate pass over the table — the multi-column
  * `count(DISTINCT x)` set plans as a single Expand + two-phase aggregate
  * (one shuffle, expand factor = #profiled columns), never one job per
  * column; min/max/null counters ride the same pass. The long-form pivot
  * at the end is a per-row `explode` over an N_cols-element array on a
  * ONE-ROW frame — free. Distinct counts are exact by contract (the gate
  * is an equality check against yesterday's profile; for
  * monitoring-grade profiles swap `countDistinct` for
  * `approx_count_distinct` and the pass drops the Expand entirely).
  */
object Profile {

  /** Profile `cols` (name → canonical column) in one pass. Each canonical
    * column must already be in an engine-portable representation — BIGINT
    * or STRING (the caller maps doubles to exact micros, timestamps to
    * epoch seconds): min/max are computed on the canonical value and cast
    * to STRING for the long form, and a raw DOUBLE's string rendering is
    * NOT portable across engines.
    *
    * Output: `(col_name, n_rows, n_nulls, n_distinct, min_repr,
    * max_repr)`, one row per profiled column; `n_distinct` excludes NULLs
    * (SQL `count(DISTINCT …)` semantics), `min_repr`/`max_repr` are NULL
    * for an all-NULL column.
    */
  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(
        sum(c.isNull.cast("long")).as(s"__nulls_$i"),
        countDistinct(c).as(s"__dist_$i"),
        min(c).cast("string").as(s"__min_$i"),
        max(c).cast("string").as(s"__max_$i"))
    }
    val onePass = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val perCol = cols.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"__nulls_$i").as("n_nulls"),
        col(s"__dist_$i").as("n_distinct"),
        col(s"__min_$i").as("min_repr"),
        col(s"__max_$i").as("max_repr"))
    }
    onePass
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_repr"), col("p.max_repr"))
  }
}
