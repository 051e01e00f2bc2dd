package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole MinHash signature of a shingle array in one pass: for each
  * shingle s, base hash h = uint32(md5("<seed>:" + s)), then
  * sig[j] = min(sig[j], (a_j·h + b_j) mod prime) for every j.
  *
  * Bit-identical to the portable formulation the SQL oracles use —
  * `aggregate(transform(shs, s -> md5_hash32(s)), array_repeat(prime, n),
  * (acc, h) -> transform(0..n-1, j -> least(acc[j], (a_j·h+b_j) % p)))` —
  * but one tight JVM loop per row instead of numHashes interpreted
  * lambda evaluations per shingle (higher-order functions never reach
  * whole-stage codegen; measured ~0.4 s of q36's sf0.1 bench time).
  * Empty shingle arrays yield the fold seed: an all-`prime` signature.
  *
  * Codegen: emits a call into [[compute]] through a reference object —
  * the md5 loop dominates, but a CodegenFallback demoted the whole
  * signature projection to interpreted evaluation (boxing every row of
  * the hottest dedup scan) and split the codegen stage.
  */
case class MinhashSigExpr(child: Expression, seed: Int, as: Seq[Long], bs: Seq[Long],
                          prime: Long = Hashing.MinhashPrime)
    extends UnaryExpression {

  require(as.nonEmpty && as.length == bs.length, "coefficient arrays must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> input, got ${other.sql}")
    }

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray
  @transient private lazy val prefixBytes = s"$seed:".getBytes("UTF-8")
  @transient private lazy val localDigest =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** Public so generated code can call it; shared verbatim by the
    * interpreted path.
    */
  def compute(arr: ArrayData): ArrayData = {
    val n = aArr.length
    val sig = Array.fill(n)(prime)
    val md = localDigest.get()
    var i = 0
    while (i < arr.numElements()) {
      md.reset()
      md.update(prefixBytes)
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      h = h * 256L + (d(0) & 0xffL)
      h = h * 256L + (d(1) & 0xffL)
      h = h * 256L + (d(2) & 0xffL)
      h = h * 256L + (d(3) & 0xffL)
      var j = 0
      while (j < n) {
        val v = (aArr(j) * h + bArr(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** [[MinhashSigExpr]] over PRECOMPUTED base hashes — same signature,
  * no md5: for each base hash h in the input array,
  * `sig[j] = min(sig[j], (a_j·h + b_j) mod prime)`.
  *
  * Bit-identical to [[MinhashSigExpr]] whenever the input holds the
  * `Hashing.md5Hash32(seed, shingle)` images of the shingle array
  * (seed-0 is what [[MinhashSigExpr]] computes internally), INCLUDING
  * deduplicated/sorted arrays: min over affine images is invariant to
  * duplicate removal and order (pinned in `DedupSpec`). This lets a
  * caller that already materialized the distinct-hash sets for an exact
  * set-similarity leg (`Dedup.blockingEval`) derive the banded MinHash
  * candidates from the SAME table instead of re-tokenizing the corpus.
  * Empty arrays yield the fold seed: an all-`prime` signature.
  */
case class MinhashSigFromHashesExpr(child: Expression, as: Seq[Long], bs: Seq[Long],
                                    prime: Long = Hashing.MinhashPrime)
    extends UnaryExpression {

  require(as.nonEmpty && as.length == bs.length, "coefficient arrays must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> input (md5Hash32 images), got ${other.sql}")
    }

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  /** Public so generated code can call it; shared by the interpreted path. */
  def compute(arr: ArrayData): ArrayData = {
    val n = aArr.length
    val sig = Array.fill(n)(prime)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < n) {
        val v = (aArr(j) * h + bArr(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigFromHashesExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig_from_hashes"
}
