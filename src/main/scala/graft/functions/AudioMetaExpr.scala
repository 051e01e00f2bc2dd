package graft.functions

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioSystem, UnsupportedAudioFileException}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Real audio header decode, JDK-only (`javax.sound.sampled` — WAV/AIFF/AU
  * readers ship with the JRE, no external codec dependency; compressed
  * codecs like MP3/OGG have no JDK reader and surface as None/NULL).
  * Shared by the expression path ([[AudioMetaExpr]]) and the batched
  * `mapPartitions` seam (`ext.Multimodal.decodeAudioBatched`) so both
  * produce bit-identical metadata — the same two-seam contract as
  * [[ImageMeta]], which this mirrors.
  */
object AudioMeta {

  /** Decoded header: duration (floor milliseconds), sample rate in Hz and
    * channel count. Duration comes from the container's frame count over
    * the frame rate — a header read, no sample decode, so it is O(header)
    * per payload regardless of audio length.
    */
  final case class Meta(durationMs: Long, sampleRateHz: Long, channels: Long)

  /** Decode audio bytes to [[Meta]]; `None` when no registered reader
    * understands the bytes (corrupt, truncated or unsupported-codec
    * payloads) or the header carries no frame count — callers decide
    * whether that is a null column or a filtered row.
    */
  def decode(bytes: Array[Byte]): Option[Meta] =
    try {
      // ByteArrayInputStream supports mark/reset, so the reader probe
      // chain needs no BufferedInputStream wrapper
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val rate = fmt.getFrameRate
        if (frames < 0 || !(rate > 0)) None // streams without a declared length
        else Some(Meta(
          (frames * 1000.0 / rate).toLong, // floor ms — deterministic for PCM rates
          fmt.getSampleRate.toLong,
          fmt.getChannels.toLong))
      } finally in.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: java.io.IOException           => None
    }
}

/** `audio_meta(payload)` — decode a binary audio column to
  * `struct<duration_ms bigint, sample_rate_hz bigint, channels bigint>`,
  * NULL for undecodable bytes. CodegenFallback is deliberate: the header
  * parse dominates the interpreted-projection overhead by orders of
  * magnitude (same trade as [[ImageMetaExpr]]).
  */
case class AudioMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("duration_ms", LongType, nullable = false),
    StructField("sample_rate_hz", LongType, nullable = false),
    StructField("channels", LongType, nullable = false)))

  // NULL both for NULL input (UnaryExpression default) and for bytes no
  // javax.sound reader understands
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
    AudioMeta.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some(m) => InternalRow(m.durationMs, m.sampleRateHz, m.channels)
      case None    => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_meta"
}
