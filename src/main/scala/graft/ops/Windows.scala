package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tumbling-window helpers — Spark's `window()` is epoch-aligned exactly
  * like Flink's `TUMBLE` (reference `PythonKafkaSink/main.py:85,96`), and
  * `window.start` is `TUMBLE_START` (`main.py:82,94`).
  */
object Windows {
  /** `TUMBLE(ts, INTERVAL 'n' SECOND)` ≙ `window(ts, "n seconds")`. */
  def tumble(ts: Column, duration: String): Column = window(ts, duration)

  /** Sliding (hopping) window — not in the reference, built-in capability
    * (SURVEY.md §2.3).
    */
  def sliding(ts: Column, duration: String, slide: String): Column =
    window(ts, duration, slide)

  /** Window start as epoch seconds (BIGINT) — the oracle-stable batch
    * projection of `TUMBLE_START` (timestamps round-trip through parquet
    * with timezone annotations the DuckDB oracle does not share, so the
    * verify surface keys windows by epoch seconds).
    */
  def startSec(windowCol: Column): Column =
    unix_timestamp(windowCol.getField("start"))
}
