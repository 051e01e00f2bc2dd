package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a single-space-tokenized string, in
  * first-occurrence order.
  *
  * Exactly `array_distinct(transform(sequence(1, size-n+1), i ->
  * concat_ws(' ', tok[i..i+n-1])))` over `split(text, " ")` — but one pass
  * of plain JVM code per row instead of ~5 interpreted lambda expressions
  * per shingle (measured ~6× on the shingle-heavy dedup operators).
  * Matches `string_split(text, ' ')`-based SQL oracles: single-space
  * splitting, empty tokens preserved.
  *
  * Codegen: emits a call into [[compute]] through a reference object, so
  * the surrounding projection stays inside whole-stage codegen (a
  * CodegenFallback here demoted the ENTIRE signature projection to
  * interpreted evaluation — per-row boxing on the hottest dedup scan).
  */
case class ShingleSetExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")
    }

  /** Public so generated code can call it; shared verbatim by the
    * interpreted path.
    */
  def compute(input: UTF8String): ArrayData = {
    val toks = input.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    var i = 0
    while (i + n <= toks.length) {
      if (n == 1) {
        seen.add(toks(i))
      } else {
        val sb = new java.lang.StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        seen.add(sb.toString)
      }
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSetExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}
