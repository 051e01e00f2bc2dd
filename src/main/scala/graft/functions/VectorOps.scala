package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * All arithmetic is promoted to double and folded sequentially in array
  * order (`aggregate` is a left fold), which keeps results bit-identical
  * across engines that fold the same way — required for the DuckDB oracle
  * and good practice anyway (order-stable floating point). Everything here
  * is built-in higher-order functions → whole-stage codegen, no UDF
  * serialization on the 100 TB hot path.
  */
object VectorOps {

  /** Sequential left-fold sum of an array<double>. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def normSq(a: Column): Column =
    foldSum(transform(a, x => x.cast("double") * x.cast("double")))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(foldSum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    })))
}
