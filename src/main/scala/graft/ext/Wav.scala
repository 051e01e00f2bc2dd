package graft.ext

/** Deterministic synthetic RIFF/WAVE payloads for the PCM-sample gate
  * (`q153_audio_pcm`): real 16-bit little-endian mono PCM containers
  * whose sample values follow a CLOSED FORM of the doc id — the DuckDB
  * oracle recomputes the expected sample statistics from the formulas
  * below without touching bytes, while the Spark side must actually
  * parse the container and scan the frames
  * ([[graft.functions.AudioPcm.decode]]). A decode bug (endianness,
  * sign handling, header offset, frame count) shifts the sum of squares
  * or the peak and surfaces as an oracle mismatch — the
  * [[Bmff]]/[[Png]] closed-form-fixture pattern applied to audio.
  *
  * Parameterization (the `q153` oracle SQL mirrors these formulas
  * verbatim — change BOTH or neither):
  *  - `n = 64 + id % 33` samples;
  *  - `sample(i) = (id·31 + i·7919) mod 65536 − 32768` for `i = 0..n−1`
  *    (7919 is prime to 65536, so the values sweep the full signed
  *    16-bit range including −32768 — the abs edge case).
  */
object Wav {

  /** Sample rate of the synthetic payloads (any valid rate works; the
    * stats are rate-independent, but the header must carry one).
    */
  val SampleRateHz = 8000

  /** The closed-form sample value — shared by the builder and the spec
    * (the oracle re-derives it in SQL).
    */
  def sampleValue(id: Long, i: Long): Int =
    (((id * 31 + i * 7919) % 65536) - 32768).toInt

  /** A complete RIFF/WAVE file: 44-byte canonical header + 16-bit LE
    * mono PCM data chunk.
    */
  def synthetic(id: Long): Array[Byte] = {
    val n = (64 + id % 33).toInt
    val dataSize = n * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataSize)
      .put("WAVE".getBytes("ISO-8859-1"))
    b.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(SampleRateHz)
      .putInt(SampleRateHz * 2) // byte rate = rate * blockAlign
      .putShort(2) // blockAlign = channels * bytesPerSample
      .putShort(16) // bits per sample
    b.put("data".getBytes("ISO-8859-1")).putInt(dataSize)
    var i = 0
    while (i < n) {
      b.putShort(sampleValue(id, i.toLong).toShort)
      i += 1
    }
    b.array()
  }
}
