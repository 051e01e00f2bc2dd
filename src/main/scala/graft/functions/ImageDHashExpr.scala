package graft.functions

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual difference hash (dHash) — the image analog of
  * [[graft.ext.Dedup.simhash64]]'s text fingerprint: a 64-bit signature
  * whose Hamming distance tracks VISUAL similarity, robust to re-encoding
  * (PNG↔BMP), resolution changes, and small local edits, because it is a
  * function of the downsampled luminance GRADIENT SIGN field rather than
  * of bytes.
  *
  * Definition (all-integer — deterministic across JVMs/platforms for
  * lossless inputs, which is what lets the `q207` oracle recompute it
  * arithmetically from the fixture generator's closed form):
  *  - the decoded w×h image is nearest-neighbor-sampled on a 9-wide ×
  *    8-tall grid: cell `(gx, gy)` reads source pixel
  *    `(gx·w/9, gy·h/8)` (floor division — [[ImageResize]]'s exact
  *    resampling convention);
  *  - each cell's brightness is the CHANNEL SUM `r+g+b` (0..765) —
  *    comparing sums is comparing means without a division to get wrong;
  *  - bit `b = 8·gy + gx` (gx in 0..7) is set iff cell `(gx+1, gy)` is
  *    strictly brighter than cell `(gx, gy)` — 8 horizontal comparisons
  *    per row × 8 rows = 64 bits.
  * Bit 63 makes the hash negative for some images (same convention as
  * `simhash64`); consumers band with shift+mask, never `%`.
  */
object ImageDHash {

  // same process-wide heap-path init as ImageMeta — a job calling ONLY
  // image_dhash must not spill payloads to ImageIO's temp-file cache
  ImageMeta.disableDiskCache()

  /** Decode + 9×8 sample + pack; `None` for bytes no ImageIO reader
    * understands. Only the 72 sampled pixels are touched after decode —
    * O(1) per row past the decode itself.
    */
  def dhash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val row = new Array[Int](w)
        val s = new Array[Int](9)
        var hash = 0L
        var gy = 0
        while (gy < 8) {
          // bulk-fetch the one NEEDED source row (8 color-model
          // conversion calls total) — the ImageResize lesson: per-pixel
          // getRGB measured ~100× slower on the PNG probe
          img.getRGB(0, gy * h / 8, w, 1, row, 0, w)
          var gx = 0
          while (gx < 9) {
            val rgb = row(gx * w / 9)
            s(gx) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            gx += 1
          }
          gx = 0
          while (gx < 8) {
            if (s(gx + 1) > s(gx)) hash |= 1L << (8 * gy + gx)
            gx += 1
          }
          gy += 1
        }
        Some(hash)
      }
    } catch {
      // truncated/corrupt streams throw instead of returning null —
      // treat exactly like "no reader claimed the bytes"
      case _: java.io.IOException => None
      case _: RuntimeException    => None
    }
}

/** `image_dhash(payload)` — 64-bit perceptual hash of a binary image
  * column, NULL for undecodable bytes. CodegenFallback for the same
  * reason as [[ImageMetaExpr]]: the decode dominates, interpreting the
  * projection node costs nothing measurable.
  */
case class ImageDHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

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
    ImageDHash.dhash(input.asInstanceOf[Array[Byte]]) match {
      case Some(h) => h
      case None    => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "image_dhash"
}
