package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage-side
  * companion of similarity search (4× smaller vectors; rerank on the
  * full-precision column). Symmetric per-vector scheme:
  * `q_i = floor(x_i / scale)` with `scale = max|x| / 127` — floor, not
  * round, so the arithmetic is bit-reproducible across engines.
  * Pure projections: zero shuffle.
  */
object Quantize {

  /** Per-vector scale = max(|x|)/127 in double precision. */
  def scaleOf(vec: Column): Column =
    aggregate(vec, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  /** int8 codes as array<int> (parquet-friendly; values ∈ [-128, 127]).
    * `scale` must be a materialized column (not `scaleOf(vec)` inline —
    * an embedded fold would be re-evaluated per element).
    */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x.cast("double") / scale).cast("int"))

  /** Reconstruction: q_i × scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Mean squared reconstruction error in double precision. */
  def mse(vec: Column, codes: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, dequantize(codes, scale), (x, d) => {
        val e = x.cast("double") - d
        e * e
      }),
      lit(0.0), (acc, x) => acc + x) / size(vec)

  /** Per-DIMENSION corpus (min, max) — the feature-scaling statistics
    * pass, complementing the per-vector scheme above: one `posexplode`
    * + one aggregate keyed by position (map-side partials collapse each
    * task to ≤ dim cells, so the shuffle ships O(tasks·dim) rows no
    * matter the corpus size), collected to the driver — bounded by the
    * embedding dimensionality, NOT the row count (the q141 literal-
    * centroid convention).
    */
  def dimMinMax(df: DataFrame, vecCol: Column): Array[(Double, Double)] =
    df.filter(vecCol.isNotNull)
      .select(posexplode(vecCol).as(Seq("pos", "__x")))
      .groupBy("pos")
      .agg(min(col("__x").cast("double")).as("mn"),
        max(col("__x").cast("double")).as("mx"))
      .orderBy("pos")
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

  /** Min-max normalization to integer ppm per (vector, dimension) —
    * `floor((x − minᵢ)·10⁶ / (maxᵢ − minᵢ))`, 0 for a constant
    * dimension. The stats ride along as LITERAL arrays, so the
    * normalize pass is a pure map-side projection (no join, no second
    * shuffle) — at 100 TB the corpus is read twice (stats + apply) and
    * nothing else moves. Floor on IEEE doubles is bit-reproducible
    * across engines, which is what lets the whole output hash-gate.
    */
  def minMaxNormalizePpm(df: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    val stats = dimMinMax(df, vecCol)
    val mins = array(stats.map(s => lit(s._1)).toSeq: _*)
    val rngs = array(stats.map(s => lit(s._2 - s._1)).toSeq: _*)
    df.filter(vecCol.isNotNull)
      .select(idCol.as("id"), posexplode(vecCol).as(Seq("pos", "__x")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        when(element_at(rngs, col("pos") + 1) === 0.0, 0L)
          .otherwise(floor(
            (col("__x").cast("double") - element_at(mins, col("pos") + 1)) *
              1000000d / element_at(rngs, col("pos") + 1)).cast("long"))
          .as("norm_ppm"))
  }
}
