package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{AudioMeta, AudioMetaExpr, Hashing, ImageMeta, ImageMetaExpr, VideoMeta, VideoMetaExpr}

/** Multimodal-column plumbing (north-star extensions, SURVEY.md §2.4).
  *
  * Images/audio/video are carried as opaque `binary` columns plus typed
  * metadata. The Spark-side contract — schema, partition-friendly batch
  * shape, expression/`mapPartitions` seams — is real and tested.
  *
  * IMAGE decode is REAL: [[decodeImageMeta]] / [[decodeImageBatched]]
  * decode PNG/BMP/GIF/JPEG bytes with the JDK's `javax.imageio` (no
  * external codec dependency) and emit exact integer pixel statistics.
  * AUDIO decode is REAL too: [[decodeAudioMeta]] / [[decodeAudioBatched]]
  * parse WAV/AIFF/AU headers with the JDK's `javax.sound.sampled` and
  * emit exact duration/rate/channel metadata. VIDEO CONTAINER metadata is
  * REAL as well: [[decodeVideoMeta]] / [[decodeVideoBatched]] walk the
  * ISO-BMFF (MP4/MOV) box structure to the `mvhd` movie header for exact
  * duration/timescale — a dependency-free header parse — and KEYFRAME
  * byte offsets are REAL from the same walk ([[keyframeOffsets]] /
  * [[keyframeSlices]] / [[keyframeRanges]] read the
  * `stss`/`stsc`/`stsz`/`stco` sample tables). Video FRAME decode is
  * REAL for MJPEG tracks — [[decodeKeyframeFrames]] composes the
  * keyframe byte ranges with the ImageIO JPEG path for exact per-frame
  * pixel statistics, oracle-gated by `q140`. Inter-coded codecs
  * (H.264/H.265/AV1) still require a codec library this environment
  * doesn't ship; those samples degrade to NULL frames, and the
  * deterministic fakes (`decodeStub`/`decodeBatched`, q42/q47/q72) remain
  * as the generic-payload plumbing gate — schema, batching, determinism —
  * shared by all paths.
  */
/** Output row of the batched decode seam. */
case class DecodedMedia(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                        duration_ms: Long)

/** Output row of the REAL image decode seam; meta fields are None for
  * payloads no ImageIO reader understands.
  */
case class DecodedImage(doc_id: Long, n_bytes: Long, width: Option[Long],
                        height: Option[Long], mean_pixel_ppm: Option[Long])

/** Output row of the REAL audio decode seam; meta fields are None for
  * payloads no javax.sound reader understands.
  */
case class DecodedAudio(doc_id: Long, n_bytes: Long, duration_ms: Option[Long],
                        sample_rate_hz: Option[Long], channels: Option[Long])

/** Output row of the REAL video container decode seam; meta fields are
  * None for payloads that are not parseable ISO-BMFF.
  */
case class DecodedVideo(doc_id: Long, n_bytes: Long, duration_ms: Option[Long],
                        timescale_hz: Option[Long])

object Multimodal {

  /** Attach a binary payload column derived from text (test harness for
    * the binary pipeline; in production the payload arrives from the
    * source as real media bytes).
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8").cast("binary"))

  /** Payload size in bytes. */
  def byteLength(payload: Column): Column = octet_length(payload).cast("long")

  /** STUB decoder ========================================================
    * A real implementation decodes the media header; this deterministic
    * fake derives plausible (width, height, duration_ms) metadata from the
    * payload's content hash so every downstream operator (partitioning,
    * filtering, feature joins) is exercised with stable values.
    */
  def decodeStub(payload: Column): Column = {
    val h = Hashing.md5Hash32(0, payload.cast("string"))
    struct(
      (h % 1280 + 1).cast("long").as("width"),
      (floor(h / 1280) % 720 + 1).cast("long").as("height"),
      (h % 60000).cast("long").as("duration_ms"))
  }

  /** Frame-sampling analog: byte-range slices at `n` evenly spaced offsets
    * (the slicing/batching dataflow of keyframe extraction, with synthetic
    * anchors). For ISO-BMFF payloads [[keyframeSlices]] supersedes this
    * with TRUE sync-sample offsets; this analog remains for payloads with
    * no parseable sample table. Integer-exact step so the offsets are
    * engine-portable.
    */
  def sampleSlices(payload: Column, n: Int, sliceLen: Int = 8): Column = {
    val total = octet_length(payload)
    val step = greatest(
      floor((total - sliceLen) / lit(math.max(n - 1, 1))).cast("long"), lit(0L))
    transform(sequence(lit(0), lit(n - 1)),
      i => payload.substr((i * step + 1).cast("int"), lit(sliceLen)))
  }

  /** Resize analog: fit the decoded (width, height) into a square target
    * box preserving aspect ratio — pure integer metadata arithmetic (a
    * real implementation resizes pixels; the dimension contract is what
    * downstream batching/padding logic consumes).
    */
  def resizeStub(media: Column, target: Int = 224): Column = {
    val longest = greatest(media.getField("width"), media.getField("height"))
    struct(
      floor(media.getField("width") * target / longest).cast("long").as("rw"),
      floor(media.getField("height") * target / longest).cast("long").as("rh"))
  }

  /** REAL pixel resize: decode + aspect-fit + integer nearest-neighbor
    * resample, returning `struct<rw, rh, mean_pixel_ppm>` of the RESIZED
    * image (NULL for undecodable bytes) — the actual-pixels successor to
    * [[resizeStub]]'s dimension arithmetic, oracle-gated by `q143` over
    * lossless PNG gradients. See [[graft.functions.ImageResize]].
    */
  def resizeMeta(payload: Column, target: Int = 224): Column =
    ColumnBridge.column(graft.functions.ImageResizeMetaExpr(
      ColumnBridge.expression(payload), target))

  /** Deterministic fixed-width feature vector from the payload (stand-in
    * for an image/audio embedding model; 4 hash-derived doubles in [0,1)).
    */
  def featureStub(payload: Column, dim: Int = 4): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => Hashing.hashUnit(i, payload.cast("string")))

  /** Batched decode seam: the place a REAL media decoder (JNI codec,
    * ONNX feature extractor, …) plugs in. `mapPartitions` gives the
    * decoder a whole partition iterator — amortize model/codec init once
    * per partition, process records in batches, never per-row JNI calls.
    * The decode itself is the same deterministic STUB as [[decodeStub]];
    * the partition-batched dataflow (init-once, iterator-in/iterator-out,
    * schema contract) is the production-shaped part.
    */
  def decodeBatched(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withBin = withPayload(df).select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
    withBin.mapPartitions { rows =>
      // per-partition init happens HERE (load codec / model once)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { case (id, payload) =>
        digest.reset()
        val d = digest.digest(("0:" + new String(payload, "UTF-8")).getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        DecodedMedia(id, payload.length.toLong,
          h % 1280 + 1, h / 1280 % 720 + 1, h % 60000)
      }
    }.toDF()
  }

  /** REAL image decode, expression path: binary column →
    * `struct<width, height, mean_pixel_ppm>` via JDK ImageIO, NULL for
    * undecodable bytes. Exact integer stats — see
    * [[graft.functions.ImageMeta.decode]].
    */
  def decodeImageMeta(payload: Column): Column =
    ColumnBridge.column(ImageMetaExpr(ColumnBridge.expression(payload)))

  /** 64-bit perceptual difference hash (dHash) of a binary image column,
    * NULL for undecodable bytes — the image-side near-dup fingerprint
    * ([[graft.functions.ImageDHash]]); pair/cluster via
    * [[Dedup.perceptualDupPairs]]'s Hamming banding.
    */
  def imageDHash(payload: Column): Column =
    ColumnBridge.column(graft.functions.ImageDHashExpr(
      ColumnBridge.expression(payload)))

  /** REAL image decode, batched `mapPartitions` path — the production
    * shape for heavy decodes: per-partition init (here: switching ImageIO
    * off its temp-file stream cache) happens once, then the partition
    * iterator streams through the decoder. Bit-identical metadata to
    * [[decodeImageMeta]]; rows with undecodable payloads surface as
    * None/NULL meta rather than vanishing, so corrupt-payload rates stay
    * observable downstream.
    */
  def decodeImageBatched(df: DataFrame, idCol: String = "doc_id",
                         payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withBin = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
    withBin.mapPartitions { rows =>
      ImageMeta.disableDiskCache() // init-once per partition
      rows.map { case (id, rawPayload) =>
        // NULL payloads surface as (n_bytes=0, NULL meta) rows, not NPEs
        val payload = if (rawPayload == null) Array.emptyByteArray else rawPayload
        ImageMeta.decode(payload) match {
          case Some(m) => DecodedImage(id, payload.length.toLong,
            Some(m.width), Some(m.height), Some(m.meanPixelPpm))
          case None => DecodedImage(id, payload.length.toLong, None, None, None)
        }
      }
    }.toDF()
  }

  /** REAL audio decode, expression path: binary column →
    * `struct<duration_ms, sample_rate_hz, channels>` via the JDK's
    * `javax.sound.sampled`, NULL for undecodable bytes (unsupported
    * codecs included). Header parse only — O(header) per row, never a
    * sample scan. See [[graft.functions.AudioMeta.decode]].
    */
  def decodeAudioMeta(payload: Column): Column =
    ColumnBridge.column(AudioMetaExpr(ColumnBridge.expression(payload)))

  /** REAL audio SAMPLE decode, expression path: binary column →
    * `struct<n_samples, sum_sq, peak_abs>` over the payload's actual PCM
    * frames — the loudness/clipping/silence gates of an audio curation
    * pass, as exact BIGINTs (oracle-gated by `q153` over closed-form
    * [[Wav]] fixtures). NULL for undecodable or unsupported-encoding
    * bytes. Unlike [[decodeAudioMeta]] this scans the whole payload —
    * O(bytes) per row by necessity.
    */
  def audioPcmStats(payload: Column): Column =
    ColumnBridge.column(graft.functions.AudioPcmStatsExpr(
      ColumnBridge.expression(payload)))

  /** Windowed PCM energy contour: binary column →
    * `array<struct<n, energy>>` over fixed sample windows — the
    * silence-span/fade/level-jump detector where [[audioPcmStats]]
    * gives one clip-level number (oracle-gated by `q191`). Output is
    * bounded by samples/window, never the raw sample count; same
    * whole-payload O(bytes) scan as the stats expression, ONE shared
    * sample-extraction path (they cannot drift).
    */
  def audioEnergyContour(payload: Column, windowSamples: Int): Column =
    ColumnBridge.column(graft.functions.AudioEnergyContourExpr(
      ColumnBridge.expression(payload), windowSamples))

  /** REAL audio decode, batched `mapPartitions` path — same init-once
    * partition seam as [[decodeImageBatched]] (a compressed-codec plug-in
    * would load its native library exactly once per partition here).
    * Bit-identical metadata to [[decodeAudioMeta]]; undecodable payloads
    * surface as None/NULL meta rather than vanishing, so corrupt-payload
    * rates stay observable downstream.
    */
  def decodeAudioBatched(df: DataFrame, idCol: String = "doc_id",
                         payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withBin = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
    withBin.mapPartitions { rows =>
      // per-partition init seam (the JDK readers need none; a real codec
      // library loads here, once, not per row)
      rows.map { case (id, rawPayload) =>
        val payload = if (rawPayload == null) Array.emptyByteArray else rawPayload
        AudioMeta.decode(payload) match {
          case Some(m) => DecodedAudio(id, payload.length.toLong,
            Some(m.durationMs), Some(m.sampleRateHz), Some(m.channels))
          case None => DecodedAudio(id, payload.length.toLong, None, None, None)
        }
      }
    }.toDF()
  }

  /** REAL video container decode, expression path: binary column →
    * `struct<duration_ms, timescale_hz>` via a dependency-free ISO-BMFF
    * box walk (`moov`/`mvhd`), NULL for non-MP4/MOV bytes. Header parse
    * only — see [[graft.functions.VideoMeta.decode]].
    */
  def decodeVideoMeta(payload: Column): Column =
    ColumnBridge.column(VideoMetaExpr(ColumnBridge.expression(payload)))

  /** REAL keyframe byte offsets for ISO-BMFF payloads: `array<bigint>` of
    * each sync sample's first byte, from the `stss`+`stsc`+`stsz`+`stco`/
    * `co64` sample tables — no codec involved, NULL for non-containers or
    * tracks without a sync-sample table. See
    * [[graft.functions.VideoMeta.keyframeOffsets]].
    */
  def keyframeOffsets(payload: Column): Column =
    ColumnBridge.column(graft.functions.VideoKeyframesExpr(
      ColumnBridge.expression(payload)))

  /** Keyframe byte-range extraction: `sliceLen` bytes of the payload at
    * each TRUE sync-sample offset — the real-container replacement for
    * [[sampleSlices]]' evenly-spaced analog (same slicing dataflow, real
    * anchors). NULL rows propagate from [[keyframeOffsets]]; offsets at
    * or past the payload end yield empty/short slices (`substr`
    * semantics), which is exactly what a truncated download looks like.
    */
  def keyframeSlices(payload: Column, sliceLen: Int = 8): Column =
    transform(keyframeOffsets(payload),
      o => payload.substr((o + 1).cast("int"), lit(sliceLen)))

  /** Keyframe byte RANGES — `array<struct<kf_offset, kf_bytes>>` of each
    * sync sample's exact position AND size from the `stsz` table — the
    * input contract of real frame decoding: `payload[kf_offset,
    * kf_offset + kf_bytes)` is one complete coded sample. NULL for
    * non-containers or tracks without a sync-sample table. See
    * [[graft.functions.VideoMeta.keyframeRanges]].
    */
  def keyframeRanges(payload: Column): Column =
    ColumnBridge.column(graft.functions.VideoKeyframeRangesExpr(
      ColumnBridge.expression(payload)))

  /** REAL video FRAME decode for MJPEG-in-MP4: each sync sample of an
    * MJPEG track is a complete JPEG codestream, so cutting the sample's
    * exact byte range ([[keyframeRanges]]) and handing it to the JDK's
    * ImageIO JPEG decoder ([[decodeImageMeta]]) yields true per-keyframe
    * pixel statistics — `array<struct<kf_offset bigint, frame
    * struct<width, height, mean_pixel_ppm>>>` — with no external codec.
    * Non-JPEG samples (H.264/H.265/AV1 payloads, which DO need a codec
    * library this environment doesn't ship) surface as NULL `frame`
    * structs rather than erroring, so a mixed-codec corpus degrades to
    * metadata-only for those tracks. Samples past the 2 GiB binary-column
    * addressing limit also yield NULL frames (guarded before the `substr`
    * int cast — ANSI mode would otherwise throw on the overflow).
    */
  def decodeKeyframeFrames(payload: Column): Column = {
    val frameType = "struct<width:bigint,height:bigint,mean_pixel_ppm:bigint>"
    transform(keyframeRanges(payload), r => {
      val off = r.getField("kf_offset")
      val len = r.getField("kf_bytes")
      val addressable = off >= 0 && len > 0 &&
        (off + len) <= lit(Int.MaxValue.toLong - 1)
      struct(
        off.as("kf_offset"),
        when(addressable,
          decodeImageMeta(payload.substr((off + 1).cast("int"), len.cast("int"))))
          .otherwise(lit(null).cast(frameType)).as("frame"))
    })
  }

  /** REAL video container decode, batched `mapPartitions` path — same
    * init-once partition seam as the image/audio twins (a real frame
    * decoder loads its codec here, once per partition). Bit-identical
    * metadata to [[decodeVideoMeta]]; unparseable payloads surface as
    * None/NULL meta rather than vanishing.
    */
  def decodeVideoBatched(df: DataFrame, idCol: String = "doc_id",
                         payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withBin = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
    withBin.mapPartitions { rows =>
      rows.map { case (id, rawPayload) =>
        val payload = if (rawPayload == null) Array.emptyByteArray else rawPayload
        VideoMeta.decode(payload) match {
          case Some(m) => DecodedVideo(id, payload.length.toLong,
            Some(m.durationMs), Some(m.timescaleHz))
          case None => DecodedVideo(id, payload.length.toLong, None, None)
        }
      }
    }.toDF()
  }

  /** Media metadata table: id, byte length, decoded header fields, feature
    * vector — the canonical multimodal projection.
    */
  def mediaTable(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val withBin = withPayload(df)
    withBin.select(
      col(idCol),
      byteLength(col("payload")).as("n_bytes"),
      decodeStub(col("payload")).as("media"),
      featureStub(col("payload")).as("feature"))
  }
}
