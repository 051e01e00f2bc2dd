package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Real video CONTAINER metadata decode, dependency-free: a minimal
  * ISO-BMFF (MP4/MOV, ISO 14496-12) box parser that reads the `moov` →
  * `mvhd` movie header for the presentation timescale and duration. This
  * is a pure header walk — no sample data is touched and no codec is
  * needed, so it is O(header) per payload and covers the one piece of
  * video metadata a curation pipeline filters on (duration). FRAME
  * decode (pixels, keyframes) still requires a codec library and remains
  * behind the deterministic stub seams (`ext.Multimodal.decodeStub` /
  * `decodeBatched`).
  *
  * Mirrors [[ImageMeta]]/[[AudioMeta]]: one decode shared by the
  * expression path ([[VideoMetaExpr]]) and the batched `mapPartitions`
  * seam (`ext.Multimodal.decodeVideoBatched`), `None` for anything that
  * is not a well-formed ISO-BMFF stream with an mvhd box.
  */
object VideoMeta {

  /** `durationMs` is floor(duration·1000/timescale); `timescaleHz` is the
    * movie timescale (ticks per second).
    */
  final case class Meta(durationMs: Long, timescaleHz: Long)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, "ISO-8859-1")

  /** Walk the top-level boxes in `[from, until)` looking for `target`;
    * returns (payloadStart, payloadEnd). Handles 64-bit `largesize`
    * (size==1) and to-end-of-file (size==0) boxes; bails on any
    * inconsistent length instead of scanning garbage.
    */
  private def findBox(b: Array[Byte], from: Int, until: Int,
                      target: String): Option[(Int, Int)] = {
    var o = from
    while (o + 8 <= until) {
      val size32 = u32(b, o)
      val (headerLen, boxEnd) =
        if (size32 == 1L) {
          if (o + 16 > until) return None
          val s = u64(b, o + 8)
          if (s < 16 || o + s > until) return None
          (16, o + s.toInt)
        } else if (size32 == 0L) (8, until) // box extends to end of input
        else {
          if (size32 < 8 || o + size32 > until) return None
          (8, o + size32.toInt)
        }
      if (boxType(b, o) == target) return Some((o + headerLen, boxEnd))
      o = boxEnd
    }
    None
  }

  /** Decode ISO-BMFF bytes to [[Meta]]; `None` when the bytes are not an
    * MP4/MOV container or carry no movie header.
    */
  def decode(bytes: Array[Byte]): Option[Meta] =
    try {
      // non-container bytes fall out of the box walk naturally: a random
      // 4-byte "size" is overwhelmingly inconsistent with the remaining
      // length, and the walk makes strict forward progress otherwise
      if (bytes.length < 16) return None
      for {
        (moovStart, moovEnd) <- findBox(bytes, 0, bytes.length, "moov")
        (mvhdStart, mvhdEnd) <- findBox(bytes, moovStart, moovEnd, "mvhd")
        meta <- {
          val version = bytes(mvhdStart) & 0xff
          // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
          // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
          val (tsOff, durLen) = if (version == 1) (20, 8) else (12, 4)
          if (mvhdStart + tsOff + 4 + durLen > mvhdEnd) None
          else {
            val timescale = u32(bytes, mvhdStart + tsOff)
            val duration =
              if (durLen == 8) u64(bytes, mvhdStart + tsOff + 4)
              else u32(bytes, mvhdStart + tsOff + 4)
            if (timescale <= 0) None
            else Some(Meta(duration * 1000L / timescale, timescale))
          }
        }
      } yield meta
    } catch {
      case _: IndexOutOfBoundsException => None
    }
}

/** `video_meta(payload)` — decode an ISO-BMFF (MP4/MOV) binary column to
  * `struct<duration_ms bigint, timescale_hz bigint>`, NULL for bytes that
  * are not a parseable container. CodegenFallback for the same reason as
  * [[ImageMetaExpr]]/[[AudioMetaExpr]].
  */
case class VideoMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("duration_ms", LongType, nullable = false),
    StructField("timescale_hz", LongType, nullable = false)))

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
    VideoMeta.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some(m) => InternalRow(m.durationMs, m.timescaleHz)
      case None    => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "video_meta"
}
