package graft.functions

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** REAL audio SAMPLE decode (the full-payload companion of
  * [[AudioMeta]]'s header parse): stream the PCM frames of a WAV/AIFF/AU
  * payload and reduce them to exact integer statistics — total sample
  * values, sum of squares, peak absolute amplitude. These are the
  * loudness/clipping gates an audio-corpus curation pass runs (silence
  * detection = sum_sq ≈ 0, clipping = peak at full scale), kept as exact
  * BIGINTs so they are oracle-checkable and partition-order-independent
  * (a float RMS would be neither).
  *
  * Supported encodings: PCM_SIGNED and PCM_UNSIGNED at 8 or 16 bits,
  * either endianness, any channel count — the formats the JDK's
  * WAV/AIFF/AU readers actually emit. Anything else (float PCM,
  * compressed codecs) returns None rather than guessing.
  */
object AudioPcm {

  /** `n_samples` counts individual sample VALUES (frames × channels);
    * `sumSq` sums `v²` over all values; `peakAbs` is `max(|v|)`
    * (0 for an empty data chunk). Values are in the signed domain of
    * the payload's bit depth — unsigned PCM is re-centered by its
    * midpoint (the standard WAV 8-bit convention), so silence is 0 in
    * every format.
    *
    * Overflow headroom: a 16-bit sample squares to < 2³¹, so sumSq
    * stays within BIGINT for ~2⁶² total samples — years of audio.
    */
  final case class Stats(nSamples: Long, sumSq: Long, peakAbs: Long)

  def decode(bytes: Array[Byte]): Option[Stats] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
        if (!(signed || unsigned) || (bits != 8 && bits != 16)) None
        else {
          val data = in.readAllBytes()
          val bytesPerSample = bits / 8
          val n = data.length / bytesPerSample // partial trailing bytes dropped
          var i = 0
          var sumSq = 0L
          var peak = 0L
          while (i < n) {
            val off = i * bytesPerSample
            val raw: Int =
              if (bits == 8) {
                if (signed) data(off).toInt else (data(off) & 0xff) - 128
              } else {
                val (lo, hi) =
                  if (fmt.isBigEndian) (data(off + 1) & 0xff, data(off).toInt)
                  else (data(off) & 0xff, data(off + 1).toInt)
                if (signed) (hi << 8) | lo
                else (((hi & 0xff) << 8) | lo) - 32768
              }
            val v = raw.toLong
            sumSq += v * v
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          Some(Stats(n.toLong, sumSq, peak))
        }
      } finally in.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: java.io.IOException           => None
    }
}

/** `audio_pcm_stats(payload)` — decode a binary audio column's PCM frames
  * to `struct<n_samples bigint, sum_sq bigint, peak_abs bigint>`, NULL
  * for undecodable or unsupported-encoding bytes. CodegenFallback is
  * deliberate: the sample scan dominates interpreted-projection overhead
  * (the [[AudioMetaExpr]] trade, at larger per-row cost).
  */
case class AudioPcmStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false)))

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
    AudioPcm.decode(input.asInstanceOf[Array[Byte]]) match {
      case Some(s) => InternalRow(s.nSamples, s.sumSq, s.peakAbs)
      case None    => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_pcm_stats"
}
