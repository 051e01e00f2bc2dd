package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * All arithmetic is promoted to double and folded sequentially in array
  * order, which keeps results bit-identical across engines that fold the
  * same way — required for the DuckDB oracle and good practice anyway
  * (order-stable floating point). The hot path (dot product) is a custom
  * codegen'd [[DotProductExpr]] — higher-order-function lambdas are
  * interpreted per element, which measured ~10× slower on all-pairs
  * similarity workloads.
  */
object VectorOps {

  /** Sequential left-fold sum of an array<double>. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product in double precision (codegen'd; bit-identical to the
    * `aggregate(zip_with(...))` fold it replaces).
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance as the SEQUENTIAL elementwise fold
    * Σ(aᵢ−bᵢ)² — deliberately NOT the `|a|²−2a·b+|b|²` expansion, whose
    * different rounding path would break bit-parity with the oracle's
    * `list_sum(list_transform(list_zip(...)))` spelling.
    */
  def l2Sq(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))
}
