package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unsigned 32-bit hash = first four bytes of MD5(utf8(str)), as a LONG.
  *
  * Bit-identical to `conv(substring(md5(str), 1, 8), 16, 10)` (the first 8
  * hex chars ARE the first 4 digest bytes) — the portable definition every
  * SQL oracle can replicate — but computed in one digest call inside
  * whole-stage codegen instead of digest → hex string → substring → base
  * conversion through four interpreted expressions. The MessageDigest
  * instance lives in operator mutable state (one per task, reset per row).
  */
case class Md5Hash32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.sql}")
    }

  @transient private lazy val localDigest =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      val h = ctx.freshName("h")
      // stepwise base-256 accumulation, NOT `(a << 24) | (b << 16) | …`:
      // janino (Spark's codegen compiler) misparses that shift-or chain as
      // a cast ("Expression ... is not a type") and the whole stage falls
      // back to interpreted execution — silently, at ~10× cost on
      // hash-heavy plans
      s"""
         |$md.reset();
         |byte[] $d = $md.digest($c.getBytes());
         |long $h = 0L;
         |$h = $h * 256L + ($d[0] & 0xffL);
         |$h = $h * 256L + ($d[1] & 0xffL);
         |$h = $h * 256L + ($d[2] & 0xffL);
         |$h = $h * 256L + ($d[3] & 0xffL);
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_hash32"
}
