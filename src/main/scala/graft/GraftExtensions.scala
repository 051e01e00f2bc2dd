package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{AudioMetaExpr, DotProductExpr, Hashing, ImageMetaExpr, ImageResizeMetaExpr, Md5Hash32Expr, MinhashSigExpr, ShingleSetExpr, VideoKeyframeRangesExpr, VideoMetaExpr}

/** SQL registration of the engine's custom Catalyst expressions — both as
  * a `SparkSessionExtensions` class (`--conf
  * spark.sql.extensions=graft.GraftExtensions`) and as a programmatic
  * registrar for an existing session. After registration the functions are
  * usable from plain SQL:
  *
  * {{{
  *   SELECT dot_product(a.embedding, b.embedding)        -- codegen'd
  *   SELECT md5_hash32('seed:' || token)                 -- portable uint32
  *   SELECT shingle_set(text, 3)                         -- distinct n-grams
  * }}}
  */
object GraftFunctions {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  private def intLiteral(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  /** Arity gate for the SQL builders: a builder indexing `es` directly
    * would surface a wrong-arity call as an opaque
    * `IndexOutOfBoundsException` (or, worse for `es.head`-style builders,
    * silently IGNORE extra arguments) — fail with the function's name and
    * expected count instead.
    */
  private def arity(name: String, n: Int, es: Seq[Expression]): Seq[Expression] = {
    if (es.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${es.length}")
    es
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"), info("dot_product", classOf[DotProductExpr]),
      (es: Seq[Expression]) => { val a = arity("dot_product", 2, es); DotProductExpr(a(0), a(1)) }),
    (FunctionIdentifier("md5_hash32"), info("md5_hash32", classOf[Md5Hash32Expr]),
      (es: Seq[Expression]) => Md5Hash32Expr(arity("md5_hash32", 1, es).head)),
    (FunctionIdentifier("shingle_set"), info("shingle_set", classOf[ShingleSetExpr]),
      (es: Seq[Expression]) => {
        val a = arity("shingle_set", 2, es)
        ShingleSetExpr(a(0), intLiteral(a(1), "shingle size"))
      }),
    // minhash_sig(shingles, numHashes): whole signature with the engine's
    // seeded universal-hash family (the same constants the oracles inline)
    (FunctionIdentifier("minhash_sig"), info("minhash_sig", classOf[MinhashSigExpr]),
      (es: Seq[Expression]) => {
        val a = arity("minhash_sig", 2, es)
        val n = intLiteral(a(1), "numHashes")
        val (as, bs) = Hashing.minhashParams(n)
        MinhashSigExpr(a(0), 0, as, bs)
      }),
    // image_meta(binary): JDK-ImageIO decode to struct<width,height,mean_pixel_ppm>
    (FunctionIdentifier("image_meta"), info("image_meta", classOf[ImageMetaExpr]),
      (es: Seq[Expression]) => ImageMetaExpr(arity("image_meta", 1, es).head)),
    // audio_meta(binary): javax.sound header decode to
    // struct<duration_ms,sample_rate_hz,channels>
    (FunctionIdentifier("audio_meta"), info("audio_meta", classOf[AudioMetaExpr]),
      (es: Seq[Expression]) => AudioMetaExpr(arity("audio_meta", 1, es).head)),
    // video_meta(binary): ISO-BMFF mvhd header decode to
    // struct<duration_ms,timescale_hz>
    (FunctionIdentifier("video_meta"), info("video_meta", classOf[VideoMetaExpr]),
      (es: Seq[Expression]) => VideoMetaExpr(arity("video_meta", 1, es).head)),
    // video_keyframe_ranges(binary): sync-sample byte ranges as
    // array<struct<kf_offset,kf_bytes>>
    (FunctionIdentifier("video_keyframe_ranges"),
      info("video_keyframe_ranges", classOf[VideoKeyframeRangesExpr]),
      (es: Seq[Expression]) =>
        VideoKeyframeRangesExpr(arity("video_keyframe_ranges", 1, es).head)),
    // image_resize_meta(binary, target): decode + aspect-fit NN resample
    // to struct<rw,rh,mean_pixel_ppm> of the RESIZED image
    (FunctionIdentifier("image_resize_meta"),
      info("image_resize_meta", classOf[ImageResizeMetaExpr]),
      (es: Seq[Expression]) => {
        val a = arity("image_resize_meta", 2, es)
        ImageResizeMetaExpr(a(0), intLiteral(a(1), "target box"))
      })
  )

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, i, builder)
    }

  /** SQL surface for the Misra–Gries heavy-hitters Aggregator. `k` is
    * fixed per registered NAME (SQL UDAFs take no constructor args per
    * call) — register under several names for several sketch widths.
    */
  def registerHeavyHitters(spark: SparkSession,
                           name: String = "heavy_hitters", k: Int = 100): Unit =
    spark.udf.register(name,
      org.apache.spark.sql.functions.udaf(graft.functions.HeavyHitters(k)))
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
