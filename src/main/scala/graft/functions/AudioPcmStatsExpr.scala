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

  /** ONE streaming scan over the payload's sample values, shared by
    * every consumer ([[decode]], [[windowedEnergy]]) so the sample
    * extraction — bit depth, endianness, unsigned re-centering — can
    * never drift between the stats and the contour. Returns false for
    * undecodable/unsupported payloads without invoking `f`.
    */
  private def scan(bytes: Array[Byte])(f: Long => Unit): Boolean =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
        if (!(signed || unsigned) || (bits != 8 && bits != 16)) false
        else {
          val data = in.readAllBytes()
          val bytesPerSample = bits / 8
          val n = data.length / bytesPerSample // partial trailing bytes dropped
          var i = 0
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
            f(raw.toLong)
            i += 1
          }
          true
        }
      } finally in.close()
    } catch {
      case _: UnsupportedAudioFileException => false
      case _: java.io.IOException           => false
    }

  def decode(bytes: Array[Byte]): Option[Stats] = {
    var n = 0L
    var sumSq = 0L
    var peak = 0L
    val ok = scan(bytes) { v =>
      n += 1
      sumSq += v * v
      val a = math.abs(v)
      if (a > peak) peak = a
    }
    if (ok) Some(Stats(n, sumSq, peak)) else None
  }

  /** Per-window `(n, Σv²)` over fixed `windowSamples`-value windows —
    * the energy CONTOUR (silence spans, fades, level jumps) where
    * [[decode]] gives one clip-level number. The output is bounded by
    * `n / windowSamples` cells, never the raw samples; the final
    * partial window keeps its true `n` so callers can normalize.
    */
  def windowedEnergy(bytes: Array[Byte], windowSamples: Int): Option[Array[(Long, Long)]] = {
    require(windowSamples > 0, "windowSamples must be positive")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var inWin = 0L
    var energy = 0L
    val ok = scan(bytes) { v =>
      energy += v * v
      inWin += 1
      if (inWin == windowSamples) {
        out += ((inWin, energy)); inWin = 0L; energy = 0L
      }
    }
    if (!ok) None
    else {
      if (inWin > 0) out += ((inWin, energy))
      Some(out.toArray)
    }
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

/** `audio_energy_contour(payload, windowSamples)` — per-window PCM
  * energy as `array<struct<n bigint, energy bigint>>` (window w covers
  * sample values `[w·W, (w+1)·W)`; the final partial window carries its
  * true `n`). NULL for undecodable payloads; same CodegenFallback trade
  * as [[AudioPcmStatsExpr]] (the sample scan dominates).
  */
case class AudioEnergyContourExpr(child: Expression, windowSamples: Int)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.ArrayType
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("energy", LongType, nullable = false))), containsNull = false)

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
    AudioPcm.windowedEnergy(input.asInstanceOf[Array[Byte]], windowSamples) match {
      case Some(ws) => new GenericArrayData(
        ws.map { case (n, e) => InternalRow(n, e) }.asInstanceOf[Array[Any]])
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_energy_contour"
}
