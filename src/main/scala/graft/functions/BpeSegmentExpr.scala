package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_segment(text)` — apply a trained byte-pair-encoding merge table
  * (see `ext.Bpe.trainMerges`) to whitespace-split words and return the
  * concatenated subword token array.
  *
  * Classic greedy application (Sennrich et al., 2016): a word starts as
  * its character sequence; repeatedly merge the adjacent pair with the
  * LOWEST merge rank until no pair is mergeable. Deterministic for a
  * fixed merge table.
  *
  * Per-row JVM loop reached through a codegen reference-object call (the
  * same pattern as [[MinhashSigExpr]]) so the surrounding projection —
  * packing's token counting runs this over every curated document —
  * stays inside whole-stage codegen. Words repeat Zipf-style, so a
  * per-thread bounded memo of word → segmentation short-circuits the
  * merge loop for the hot vocabulary — at 100 TB this makes the common
  * path a hash lookup, not a merge loop.
  */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.sql}")
    }

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private val MemoMax = 65536
  @transient private lazy val memo =
    new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean =
            size() > MemoMax
        }
    }

  private def segmentWord(word: String): Array[String] = {
    val cached = memo.get().get(word)
    if (cached != null) return cached
    var parts = word.map(_.toString).toArray
    var done = parts.length < 2
    while (!done) {
      // lowest-rank applicable pair this round
      var best = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = rank.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
            out += a + b; j += 2 // left-to-right, non-overlapping
          } else { out += parts(j); j += 1 }
        }
        parts = out.result()
        done = parts.length < 2
      }
    }
    memo.get().put(word, parts)
    parts
  }

  /** Public so generated code can call it; shared verbatim by the
    * interpreted path.
    */
  def compute(input: UTF8String): ArrayData = {
    val text = input.toString
    val out = Array.newBuilder[UTF8String]
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) segmentWord(text.substring(start, i))
          .foreach(t => out += UTF8String.fromString(t))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSegmentExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_segment"
}
