package graft.functions

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Real image decode, JDK-only (`javax.imageio` — PNG/BMP/GIF/JPEG ship
  * with the JRE, no external codec dependency). Shared by the expression
  * path ([[ImageMetaExpr]]) and the batched `mapPartitions` seam
  * (`ext.Multimodal.decodeImageBatched`) so both produce bit-identical
  * metadata.
  */
object ImageMeta {

  // process-wide, on first use from EITHER decode path: ImageIO defaults
  // to spilling every read stream to a temp-FILE cache — per-row disk I/O
  // on a corpus-scale decode. The expression path has no per-partition
  // init hook, so the object initializer covers it.
  disableDiskCache()

  /** Decoded header + exact pixel statistic. `meanPixelPpm` is the mean
    * 8-bit channel intensity over R, G and B of every pixel, scaled to
    * parts-per-million of full scale (255) with floor division — pure
    * integer arithmetic, so the value is deterministic across JVMs and
    * platforms for lossless formats (PNG/BMP/GIF).
    */
  final case class Meta(width: Long, height: Long, meanPixelPpm: Long)

  /** Process-wide decode init: `ImageIO` defaults to spilling stream
    * contents to temp-file caches; an executor decoding millions of
    * in-memory payloads wants the heap path. Idempotent — the batched
    * seam calls it once per partition as its init-once step.
    */
  def disableDiskCache(): Unit = ImageIO.setUseCache(false)

  /** Decode image bytes to [[Meta]]; `None` for bytes no registered
    * reader understands (corrupt or non-image payloads) — callers decide
    * whether that is a null column or a filtered row. Pixels are read in
    * bounded row strips so one pathologically tall image cannot allocate
    * a width×height int buffer.
    */
  def decode(bytes: Array[Byte]): Option[Meta] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        val strip = math.max(1, math.min(h, (1 << 20) / math.max(w, 1)))
        val buf = new Array[Int](w * strip)
        var y = 0
        while (y < h) {
          val rows = math.min(strip, h - y)
          // bulk sRGB fetch: one color-model conversion call per strip,
          // not per pixel
          img.getRGB(0, y, w, rows, buf, 0, w)
          var i = 0
          val n = w * rows
          while (i < n) {
            val rgb = buf(i)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            i += 1
          }
          y += rows
        }
        // max sum = 765 · w · h < 2^63 for any image addressable by ints;
        // ppm scaling stays in Long because sum ≤ ~1.6e12 ≪ 9.2e12
        Some(Meta(w.toLong, h.toLong, sum * 1000000L / (3L * 255L * w * h)))
      }
    } catch {
      // ImageIO readers throw on truncated/corrupt streams rather than
      // returning null; treat exactly like "no reader claimed the bytes"
      case _: java.io.IOException => None
      case _: RuntimeException    => None
    }
}

/** `image_meta(payload)` — decode a binary image column to
  * `struct<width bigint, height bigint, mean_pixel_ppm bigint>`, NULL for
  * undecodable bytes. CodegenFallback is deliberate: the decode dominates
  * cost by orders of magnitude, so interpreting this one projection node
  * costs nothing measurable (unlike [[MinhashSigExpr]], which sits on the
  * per-document dedup scan and generates a codegen call instead).
  */
case class ImageMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("mean_pixel_ppm", LongType, nullable = false)))

  // NULL both for NULL input (UnaryExpression default) and for bytes no
  // ImageIO reader understands
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary input, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    ImageMeta.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some(m) => InternalRow(m.width, m.height, m.meanPixelPpm)
      case None    => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "image_meta"
}
