package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact bounded Levenshtein distance: returns the character (code
  * point) edit distance when it is ≤ `maxDist`, and −1 otherwise — the
  * verify-stage primitive for the FastSS dedup/linkage family.
  *
  * Semantically equal to `CASE WHEN levenshtein(l, r) <= d THEN
  * levenshtein(l, r) ELSE -1 END`, but built for the NEAR-DUP workload
  * where candidate pairs share almost all of their text:
  *
  *  1. common prefix and suffix are trimmed first (both trims are
  *     exact: `lev(c·a, c·b) = lev(a·c, b·c) = lev(a, b)`), so a pair
  *     differing by one token runs its DP over a few characters, not
  *     the whole document;
  *  2. the DP is Ukkonen-banded at radius `maxDist` with an early exit
  *     when a full row exceeds the bound — O(len·maxDist) worst case
  *     instead of O(len²).
  *
  * Distances are over Unicode CODE POINTS (what DuckDB's `levenshtein`
  * counts), so oracle parity holds beyond ASCII. Codegen emits a call
  * through a reference object (the [[ShingleSetExpr]] pattern), keeping
  * the surrounding verify projection inside whole-stage codegen.
  */
case class BoundedLevenshteinExpr(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression {

  require(maxDist >= 0, "maxDist must be >= 0")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    }

  /** Public so generated code can call it; shared verbatim by the
    * interpreted path.
    */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString.codePoints.toArray
    val t = b.toString.codePoints.toArray
    // trim the common prefix, then the common suffix of what remains
    var lo = 0
    val minLen = math.min(s.length, t.length)
    while (lo < minLen && s(lo) == t(lo)) lo += 1
    var hiS = s.length
    var hiT = t.length
    while (hiS > lo && hiT > lo && s(hiS - 1) == t(hiT - 1)) {
      hiS -= 1; hiT -= 1
    }
    val m = hiS - lo
    val n = hiT - lo
    if (math.abs(m - n) > maxDist) return -1
    if (m == 0) return n // n <= maxDist via the length check above
    if (n == 0) return m
    // banded two-row DP over the trimmed cores: cells with |i−j| >
    // maxDist can never be on a ≤ maxDist path, so each row only
    // evaluates the 2·maxDist+1 in-band columns.
    val BIG = Int.MaxValue / 2
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = if (j <= maxDist) j else BIG; j += 1 }
    var i = 1
    while (i <= m) {
      val jLo = math.max(1, i - maxDist)
      val jHi = math.min(n, i + maxDist)
      cur(jLo - 1) = if (jLo == 1 && i <= maxDist) i else BIG
      var rowMin = cur(jLo - 1)
      j = jLo
      while (j <= jHi) {
        val sub = prev(j - 1) + (if (s(lo + i - 1) == t(lo + j - 1)) 0 else 1)
        val del = (if (j < i + maxDist) prev(j) else BIG) + 1
        val ins = cur(j - 1) + 1
        val v = math.min(sub, math.min(del, ins))
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (jHi < n) cur(jHi + 1) = BIG
      if (rowMin > maxDist) return -1
      System.arraycopy(cur, jLo - 1, prev, jLo - 1, jHi - jLo + 2)
      if (jHi < n) prev(jHi + 1) = BIG
      i += 1
    }
    if (prev(n) <= maxDist) prev(n) else -1
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("boundedLevExpr", this)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bounded_levenshtein"
}

object BoundedLevenshteinExpr {
  /** Column wrapper: distance if ≤ maxDist else −1. */
  def boundedLevenshtein(l: Column, r: Column, maxDist: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BoundedLevenshteinExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(l),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(r),
        maxDist))
}
