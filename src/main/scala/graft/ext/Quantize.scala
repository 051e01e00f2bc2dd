package graft.ext

import org.apache.spark.sql.Column
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
}
