package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd intersection SIZE of two SORTED-ASCENDING, DISTINCT,
  * null-element-free long arrays — the exact-Jaccard verify kernel of
  * `Dedup.jaccardPairsPrefixFromSets` (q233 / q324's truth leg).
  *
  * `size(array_intersect(a, b))` materializes the intersection array
  * (hash-set build + element copy per candidate pair) only to take its
  * length; this expression is a two-pointer merge count over the
  * already-sorted hash sets — no allocation, no hashing, one linear
  * pass, inside whole-stage codegen. For sorted-distinct inputs the
  * count is exactly `array_intersect`'s cardinality (which de-dups
  * its output — a no-op on distinct inputs), so results are
  * bit-for-bit unchanged; `DedupSpec` pins the operator against the
  * brute-force join either way.
  *
  * PRECONDITION (caller-enforced, the `shingleHashSets` contract):
  * both arrays come from `array_sort(array_distinct(...))` over
  * non-null hashes. Null ARRAY inputs yield null (standard binary
  * null intolerance); null ELEMENTS would violate the producer
  * contract and are not handled.
  */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size"
}
