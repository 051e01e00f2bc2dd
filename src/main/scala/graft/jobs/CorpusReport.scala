package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** One-scan dataset card: the corpus marginals a curation run reports
  * (language mix, quality distribution, size distribution, plus the
  * grand total) computed with GROUPING SETS — ONE corpus scan and ONE
  * shuffle produce every marginal, where the naive per-dimension
  * formulation scans once per dimension. The same plan shape as a
  * rollup: `Expand` multiplies each row into its grouping-set cells,
  * then one partial+final aggregate.
  */
object CorpusReport {

  /** Per-dimension marginals over the documents frame.
    *
    * Output rows: `(dimension, value, n_docs, n_tokens, mean_quality_ppm)`
    * where `dimension` ∈ {"total", "lang", "quality_quintile",
    * "len_magnitude"} and `value` is the cell label (NULL for "total").
    *  - `quality_quintile`: [[TextOps.qualityScorePpm]] ÷ 200 000 (0–5);
    *  - `len_magnitude`: ⌊log₁₀(chars+1)⌋ — order-of-magnitude size bin.
    */
  def report(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val enriched = docs.select(
      TextOps.langId(col(textCol)).as("lang"),
      floor(TextOps.qualityScorePpm(col(textCol)) / 200000L).cast("long")
        .as("quality_quintile"),
      floor(log10(length(col(textCol)).cast("double") + 1.0)).cast("long")
        .as("len_magnitude"),
      TextOps.tokenCount(col(textCol)).as("n_tokens"),
      TextOps.qualityScorePpm(col(textCol)).as("quality_ppm"))

    val cells = enriched
      .groupingSets(
        Seq(Seq.empty, Seq(col("lang")), Seq(col("quality_quintile")),
          Seq(col("len_magnitude"))),
        col("lang"), col("quality_quintile"), col("len_magnitude"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        floor(avg(col("quality_ppm"))).cast("long").as("mean_quality_ppm"))

    // grouping_id: bit set = column aggregated away, FIRST grouping
    // column on the MOST significant bit. All-set (7) is the grand
    // total; each marginal clears exactly its own bit: lang → 011=3,
    // quality_quintile → 101=5, len_magnitude → 110=6
    cells.select(
      when(col("gid") === 7, lit("total"))
        .when(col("gid") === 3, lit("lang"))
        .when(col("gid") === 5, lit("quality_quintile"))
        .when(col("gid") === 6, lit("len_magnitude"))
        .as("dimension"),
      coalesce(col("lang"),
        col("quality_quintile").cast("string"),
        col("len_magnitude").cast("string")).as("value"),
      col("n_docs"), col("n_tokens"), col("mean_quality_ppm"))
      .orderBy(col("dimension"), col("value"))
  }

  /** Streaming twin of [[report]]: per-event-time-window marginals over
    * the ingest stream. GROUPING SETS plans through `Expand`, which the
    * streaming planner treats conservatively, so the cell multiplication
    * is hand-rolled as an `explode` of the four dimension cells — a
    * stateless 4× row projection feeding ONE windowed stateful aggregate
    * (the only state; evicted as the watermark passes each window).
    * Output: `(window, dimension, value, n_docs, n_tokens,
    * mean_quality_ppm)` in append mode once windows close.
    */
  def reportStream(
      docs: DataFrame,
      tsCol: String = "event_time",
      windowLen: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      textCol: String = "text"
  ): DataFrame = {
    val cell = (dim: String, value: org.apache.spark.sql.Column) =>
      struct(lit(dim).as("dimension"), value.cast("string").as("value"))
    docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol),
        TextOps.tokenCount(col(textCol)).as("n_tokens"),
        TextOps.qualityScorePpm(col(textCol)).as("quality_ppm"),
        explode(array(
          cell("total", lit(null)),
          cell("lang", TextOps.langId(col(textCol))),
          cell("quality_quintile",
            floor(TextOps.qualityScorePpm(col(textCol)) / 200000L).cast("long")),
          cell("len_magnitude",
            floor(log10(length(col(textCol)).cast("double") + 1.0)).cast("long"))
        )).as("cell"))
      .groupBy(window(col(tsCol), windowLen),
        col("cell.dimension").as("dimension"), col("cell.value").as("value"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        floor(avg(col("quality_ppm"))).cast("long").as("mean_quality_ppm"))
  }
}
