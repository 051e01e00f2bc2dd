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
  * video metadata a curation pipeline filters on (duration). The same
  * walk reads the sample tables for TRUE keyframe byte offsets
  * ([[VideoMeta.keyframeOffsets]]). Only pixel/frame decode at those
  * offsets still requires a codec library and remains behind the
  * deterministic stub seams (`ext.Multimodal.decodeStub` /
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

  /** KEYFRAME byte offsets from the sample tables, still dependency-free:
    * the `stss` sync-sample box names which samples are keyframes, and
    * `stsc` (sample→chunk runs) + `stsz` (sample sizes) + `stco`/`co64`
    * (chunk offsets) locate each sample's first byte — so true keyframe
    * positions come out of the same header walk that yields duration, no
    * codec needed (decoding the PIXELS at those offsets still does).
    * Returns offsets in stss order for the first track that carries an
    * stss table; `None` for non-containers, tracks without an stss box
    * (ISO 14496-12 then deems every sample a sync sample — there is no
    * keyframe TABLE to report), or any inconsistent table (fail closed,
    * never a partial answer).
    */
  def keyframeOffsets(bytes: Array[Byte]): Option[Array[Long]] =
    keyframeRanges(bytes).map(_.map(_._1))

  /** KEYFRAME byte RANGES — `(offset, size)` of each sync sample — from
    * the same table walk as [[keyframeOffsets]] (`stsz` already supplies
    * every sample's size; reporting it alongside the offset costs
    * nothing). The range is exactly what a frame decoder needs: cut
    * `payload[offset, offset+size)` and hand it to the codec. For MJPEG
    * tracks that slice IS a complete JPEG codestream, which the JDK can
    * decode — see `ext.Multimodal.decodeKeyframeFrames`.
    */
  def keyframeRanges(bytes: Array[Byte]): Option[Array[(Long, Long)]] =
    try {
      if (bytes.length < 16) return None
      findBox(bytes, 0, bytes.length, "moov").flatMap { case (moovS, moovE) =>
        // first trak with a sync-sample table (audio traks carry none)
        var o = moovS
        var found: Option[Array[(Long, Long)]] = None
        while (found.isEmpty && o < moovE) {
          findBox(bytes, o, moovE, "trak") match {
            case Some((tS, tE)) => found = trakKeyframes(bytes, tS, tE); o = tE
            case None => o = moovE
          }
        }
        found
      }
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  private def trakKeyframes(b: Array[Byte], from: Int, until: Int): Option[Array[(Long, Long)]] =
    for {
      (mdS, mdE) <- findBox(b, from, until, "mdia")
      (mnS, mnE) <- findBox(b, mdS, mdE, "minf")
      (sbS, sbE) <- findBox(b, mnS, mnE, "stbl")
      stss <- findBox(b, sbS, sbE, "stss")
      stsc <- findBox(b, sbS, sbE, "stsc")
      stsz <- findBox(b, sbS, sbE, "stsz")
      chunks <- chunkOffsets(b, sbS, sbE)
      offsets <- sampleOffsets(b, stss, stsc, stsz, chunks)
    } yield offsets

  /** `stco` 32-bit or `co64` 64-bit chunk offsets (entry count guarded
    * against the box length so garbage can't allocate).
    */
  private def chunkOffsets(b: Array[Byte], sbS: Int, sbE: Int): Option[Array[Long]] = {
    def table(s: Int, e: Int, w: Int, read: Int => Long): Option[Array[Long]] = {
      if (s + 8 > e) return None
      val n = u32(b, s + 4)
      if (n < 0 || s + 8 + n * w > e) return None
      Some(Array.tabulate(n.toInt)(i => read(s + 8 + i * w)))
    }
    findBox(b, sbS, sbE, "stco").flatMap { case (s, e) => table(s, e, 4, u32(b, _)) }
      .orElse(findBox(b, sbS, sbE, "co64").flatMap { case (s, e) => table(s, e, 8, u64(b, _)) })
  }

  /** One forward walk over the sample-to-chunk runs accumulating sizes;
    * O(total samples), no table materialized beyond the parsed boxes.
    * Bails to `None` whenever a table contradicts another (sync sample
    * beyond the size table, chunk run past the chunk-offset count, …).
    */
  private def sampleOffsets(b: Array[Byte],
                            stss: (Int, Int), stsc: (Int, Int), stsz: (Int, Int),
                            chunks: Array[Long]): Option[Array[(Long, Long)]] = {
    val (ssS, ssE) = stss
    if (ssS + 8 > ssE) return None
    val nSync = u32(b, ssS + 4)
    if (nSync <= 0 || ssS + 8 + nSync * 4 > ssE) return None
    val sync = Array.tabulate(nSync.toInt)(i => u32(b, ssS + 8 + i * 4))

    val (szS, szE) = stsz
    if (szS + 12 > szE) return None
    val uniformSize = u32(b, szS + 4)
    val nSamples = u32(b, szS + 8)
    // a sample COUNT has no table to bound it when sizes are uniform; cap
    // it so a garbage header claiming 2³² samples can't spin the walk —
    // 64M samples is >12 days of 60 fps video, far past any payload that
    // fits a binary column
    if (nSamples <= 0 || nSamples > (1L << 26)) return None
    if (uniformSize == 0 && szS + 12 + nSamples * 4 > szE) return None
    def sizeOf(sample1: Long): Long = // 1-based
      if (uniformSize != 0) uniformSize
      else u32(b, szS + 12 + (sample1.toInt - 1) * 4)

    val (scS, scE) = stsc
    if (scS + 8 > scE) return None
    val nRuns = u32(b, scS + 4)
    if (nRuns <= 0 || scS + 8 + nRuns * 12 > scE) return None
    def firstChunk(run: Int): Long = u32(b, scS + 8 + run * 12)
    def samplesPerChunk(run: Int): Long = u32(b, scS + 8 + run * 12 + 4)

    val out = Array.ofDim[(Long, Long)](sync.length)
    var si = 0            // next sync sample to locate (stss is ascending)
    var sample = 1L       // 1-based running sample number
    var run = 0
    var chunk = 0         // 0-based into `chunks`
    while (chunk < chunks.length && si < sync.length && sample <= nSamples) {
      while (run + 1 < nRuns && firstChunk(run + 1) <= chunk + 1) run += 1
      val spc = samplesPerChunk(run)
      var off = chunks(chunk)
      var k = 0L
      while (k < spc && si < sync.length && sample <= nSamples) {
        val sz = sizeOf(sample)
        if (sample == sync(si)) { out(si) = (off, sz); si += 1 }
        off += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (si == sync.length) Some(out) else None
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

/** `video_keyframes(payload)` — sync-sample (keyframe) byte offsets of an
  * ISO-BMFF binary column as `array<bigint>`, NULL when the payload is not
  * a parseable container or carries no sync-sample table. Same
  * dependency-free header walk as [[VideoMetaExpr]] ([[VideoMeta
  * .keyframeOffsets]]); CodegenFallback for the same reason.
  */
case class VideoKeyframesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
    VideoMeta.keyframeOffsets(input.asInstanceOf[Array[Byte]]) match {
      case Some(offs) => new org.apache.spark.sql.catalyst.util.GenericArrayData(offs)
      case None       => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "video_keyframes"
}

/** `video_keyframe_ranges(payload)` — sync-sample byte RANGES of an
  * ISO-BMFF binary column as `array<struct<kf_offset bigint, kf_bytes
  * bigint>>`, NULL when the payload is not a parseable container or has
  * no sync-sample table ([[VideoMeta.keyframeRanges]]). The range form
  * feeds frame decoding: `payload[kf_offset, kf_offset + kf_bytes)` is
  * the complete coded sample (for MJPEG, a whole JPEG codestream).
  * CodegenFallback for the same reason as [[VideoMetaExpr]].
  */
case class VideoKeyframeRangesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kf_offset", LongType, nullable = false),
    StructField("kf_bytes", LongType, nullable = false))), containsNull = false)

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
    VideoMeta.keyframeRanges(input.asInstanceOf[Array[Byte]]) match {
      case Some(ranges) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ranges.map { case (off, sz) => InternalRow(off, sz): Any })
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "video_keyframe_ranges"
}
