package graft.ext

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello world media payload")).toDF("doc_id", "text")

  /** Encode a BufferedImage to bytes in the given ImageIO format. */
  private def imageBytes(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** 2×2 RGB test card: red, green / blue, white.
    * Channel sum = 255 + 255 + 255 + 765 = 1530 over 4 px · 3 ch
    * → mean_pixel_ppm = 1530·10⁶ / (3·255·4) = 500000 exactly.
    */
  private def testCard(): BufferedImage = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff)
    img.setRGB(1, 1, 0xffffff)
    img
  }

  test("withPayload produces a binary column of the UTF-8 bytes") {
    val r = Multimodal.withPayload(docs).select("payload").collect().head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world media payload")
  }

  test("mediaTable: byte length, deterministic stub metadata, feature vector shape") {
    val m = Multimodal.mediaTable(docs)
    val r = m.collect().head
    assert(r.getAs[Long]("n_bytes") == 25L)
    val media = r.getStruct(r.fieldIndex("media"))
    assert(media.getAs[Long]("width") >= 1 && media.getAs[Long]("width") <= 1280)
    assert(media.getAs[Long]("height") >= 1 && media.getAs[Long]("height") <= 720)
    assert(r.getAs[collection.Seq[Double]]("feature").size == 4)
    assert(r.getAs[collection.Seq[Double]]("feature").forall(f => f >= 0.0 && f < 1.0))
    // deterministic: same input -> same stub output
    assert(Multimodal.mediaTable(docs).collect().head == r)
  }

  test("decodeBatched (mapPartitions seam) agrees with the expression-based stub") {
    val many = (0L until 50L).map(i => (i, s"payload number $i with content")).toDF("doc_id", "text")
    val viaExpr = Multimodal.mediaTable(many)
      .select(col("doc_id"), col("n_bytes"),
        col("media.width").as("width"), col("media.height").as("height"),
        col("media.duration_ms").as("duration_ms"))
      .as[DecodedMedia].collect().sortBy(_.doc_id)
    val viaBatch = Multimodal.decodeBatched(many)
      .as[DecodedMedia].collect().sortBy(_.doc_id)
    assert(viaBatch.toList == viaExpr.toList)
  }

  test("sampleSlices returns n byte-slices of the payload") {
    val s = Multimodal.withPayload(docs)
      .select(Multimodal.sampleSlices(col("payload"), 3, 4).as("slices"))
      .collect().head.getAs[collection.Seq[Array[Byte]]]("slices")
    assert(s.size == 3)
    assert(new String(s.head, "UTF-8") == "hell")
  }

  test("resizeStub fits dimensions into the target box, preserving aspect") {
    def resize(w: Long, h: Long): (Long, Long) = {
      val r = Seq((w, h)).toDF("w", "h")
        .select(Multimodal.resizeStub(
          struct(col("w").as("width"), col("h").as("height"))).as("r"))
        .select(col("r.rw"), col("r.rh")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(resize(1280L, 720L) == (224L, 126L)) // floor(720*224/1280)
    assert(resize(720L, 1280L) == (126L, 224L)) // portrait mirrors
    assert(resize(100L, 100L) == (224L, 224L))  // upscales to the box
  }

  test("decodeImageMeta: exact pixel stats on hand-built PNG and BMP bytes") {
    val png = imageBytes(testCard(), "png")
    // 3×1 BMP, all pixels gray 128 → mean_pixel_ppm = floor(128e6/255) = 501960
    val grayImg = new BufferedImage(3, 1, BufferedImage.TYPE_INT_RGB)
    (0 until 3).foreach(x => grayImg.setRGB(x, 0, 0x808080))
    val bmp = imageBytes(grayImg, "bmp")

    val out = Seq((1L, png), (2L, bmp), (3L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.decodeImageMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("m.width"), col("m.height"), col("m.mean_pixel_ppm"))
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 2L)
    assert(out(1L).getLong(3) == 500000L) // (255+255+255+765)·1e6 / (3·255·4)
    assert(out(2L).getLong(1) == 3L && out(2L).getLong(2) == 1L)
    assert(out(2L).getLong(3) == 501960L) // floor(128·1e6 / 255)
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(3), "non-image bytes → NULL meta")
  }

  test("decodeImageBatched agrees bit-for-bit with the expression path") {
    // mixed formats, sizes and a corrupt row, across multiple partitions
    val rng = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      if (i % 10 == 9) (i, Array.fill[Byte](16)((i % 120).toByte)) // undecodable
      else {
        val w = 1 + rng.nextInt(9)
        val h = 1 + rng.nextInt(9)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        (0 until w).foreach(x => (0 until h).foreach(y =>
          img.setRGB(x, y, rng.nextInt(0x1000000))))
        (i, imageBytes(img, if (i % 2 == 0) "png" else "bmp"))
      }
    }
    val df = rows.toDF("doc_id", "payload").repartition(7)
    val viaExpr = df
      .select(col("doc_id"), octet_length(col("payload")).cast("long").as("n_bytes"),
        Multimodal.decodeImageMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("n_bytes"),
        col("m.width"), col("m.height"), col("m.mean_pixel_ppm"))
      .as[DecodedImage].collect().sortBy(_.doc_id)
    val viaBatch = Multimodal.decodeImageBatched(df)
      .as[DecodedImage].collect().sortBy(_.doc_id)
    assert(viaBatch.toList == viaExpr.toList)
    assert(viaBatch.count(_.width.isEmpty) == 4, "corrupt rows surface as NULL meta")
    assert(viaBatch.forall(r => r.width.isEmpty ||
      (r.mean_pixel_ppm.get >= 0L && r.mean_pixel_ppm.get <= 1000000L)))
  }

  test("decodeImageBatched: NULL payloads become zero-byte NULL-meta rows, not NPEs") {
    val df = Seq((1L, imageBytes(testCard(), "png")), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImageBatched(df)
      .as[DecodedImage].collect().sortBy(_.doc_id)
    assert(out(0).width.contains(2L))
    assert(out(1) == DecodedImage(2L, 0L, None, None, None))
  }

  /** 16-bit little-endian PCM WAV bytes with `nFrames` silent frames —
    * written through the JDK's own WAV writer, so the header layout is
    * exactly what a real WAV file carries.
    */
  private def wavBytes(sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * channels * 2)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudioMeta: exact duration/rate/channels on hand-built WAV bytes") {
    val out = Seq(
      (1L, wavBytes(8000f, 1, 4000)),    // 4000 frames @ 8 kHz mono = 500 ms
      (2L, wavBytes(44100f, 2, 44100)),  // 1 s of stereo CD-rate audio
      (3L, wavBytes(8000f, 1, 999)),     // floor(999·1000/8000) = 124 ms
      (4L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.decodeAudioMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("m.duration_ms"), col("m.sample_rate_hz"), col("m.channels"))
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(1) == 500L && out(1L).getLong(2) == 8000L && out(1L).getLong(3) == 1L)
    assert(out(2L).getLong(1) == 1000L && out(2L).getLong(2) == 44100L && out(2L).getLong(3) == 2L)
    assert(out(3L).getLong(1) == 124L)
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(3), "non-audio bytes → NULL meta")
  }

  test("decodeAudioBatched agrees bit-for-bit with the expression path") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 30L).map { i =>
      if (i % 10 == 9) (i, Array.fill[Byte](24)((i % 100).toByte)) // undecodable
      else (i, wavBytes(if (i % 2 == 0) 8000f else 16000f,
        1 + (i % 2).toInt, 100 + rng.nextInt(5000)))
    }
    val df = rows.toDF("doc_id", "payload").repartition(5)
    val viaExpr = df
      .select(col("doc_id"), octet_length(col("payload")).cast("long").as("n_bytes"),
        Multimodal.decodeAudioMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("n_bytes"),
        col("m.duration_ms"), col("m.sample_rate_hz"), col("m.channels"))
      .as[DecodedAudio].collect().sortBy(_.doc_id)
    val viaBatch = Multimodal.decodeAudioBatched(df)
      .as[DecodedAudio].collect().sortBy(_.doc_id)
    assert(viaBatch.toList == viaExpr.toList)
    assert(viaBatch.count(_.duration_ms.isEmpty) == 3, "corrupt rows surface as NULL meta")

    // NULL payloads: zero-byte NULL-meta rows, not NPEs (image-seam parity)
    val withNull = Seq((1L, wavBytes(8000f, 1, 800)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeAudioBatched(withNull)
      .as[DecodedAudio].collect().sortBy(_.doc_id)
    assert(out(0).duration_ms.contains(100L))
    assert(out(1) == DecodedAudio(2L, 0L, None, None, None))
  }

  test("audioPcmStats: exact n/sum-of-squares/peak on hand-built PCM payloads") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 16-bit LE mono with known samples, via the JDK's own WAV writer
    def wav16(samples: Seq[Int]): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // 16-bit BIG-endian stereo AIFF — exercises endianness + channels
    def aiff16(samples: Seq[Int]): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 2, true, true)
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = ((s >> 8) & 0xff).toByte; pcm(2 * i + 1) = (s & 0xff).toByte
      }
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length / 2L)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.AIFF, out)
      out.toByteArray
    }
    val s1 = Seq(100, -200, 32767, -32768, 0)
    val s2 = Seq(1000, -1000, 500, -500) // 2 stereo frames
    val out = Seq(
      (1L, wav16(s1)),
      (2L, aiff16(s2)),
      (3L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.audioPcmStats(col("payload")).as("st"))
      .select(col("doc_id"), col("st.n_samples"), col("st.sum_sq"), col("st.peak_abs"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def sq(xs: Seq[Int]) = xs.map(v => v.toLong * v).sum
    assert(out(1L).getLong(1) == 5L && out(1L).getLong(2) == sq(s1)
      && out(1L).getLong(3) == 32768L)
    assert(out(2L).getLong(1) == 4L && out(2L).getLong(2) == sq(s2)
      && out(2L).getLong(3) == 1000L)
    assert(out(3L).isNullAt(1), "non-audio bytes → NULL stats")
  }

  test("audioPcmStats matches Wav.synthetic's closed forms") {
    val ids = Seq(0L, 1L, 7L, 32L, 33L, 100L)
    val got = ids.map(id => (id, Wav.synthetic(id))).toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.audioPcmStats(col("payload")).as("st"))
      .select(col("doc_id"), col("st.n_samples"), col("st.sum_sq"), col("st.peak_abs"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    ids.foreach { id =>
      val n = 64 + id % 33
      val vals = (0L until n).map(i => Wav.sampleValue(id, i).toLong)
      val want = (n, vals.map(v => v * v).sum, vals.map(math.abs).max)
      assert(got(id) == want, s"id=$id: got ${got(id)}, want $want")
    }
  }

  /** One ISO-BMFF box: 32-bit big-endian size + fourcc + payload. */
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(payload.length + 8)
    b.putInt(payload.length + 8).put(tpe.getBytes("ISO-8859-1")).put(payload)
    b.array()
  }

  /** Minimal MP4: ftyp + moov(mvhd) with the given movie timescale and
    * duration, spec-layout byte offsets (ISO 14496-12 §8.2.2).
    */
  private def mp4Bytes(timescale: Int, duration: Long, v1: Boolean = false): Array[Byte] = {
    val mvhd = if (v1) {
      val b = java.nio.ByteBuffer.allocate(112) // v1 header + rate..next_track_ID
      b.put(1.toByte).put(Array[Byte](0, 0, 0)) // version, flags
      b.putLong(0L).putLong(0L)                 // creation, modification
      b.putInt(timescale).putLong(duration)
      b.array()
    } else {
      val b = java.nio.ByteBuffer.allocate(100) // full v0 mvhd payload
      b.putInt(0)                               // version 0, flags
      b.putInt(0).putInt(0)                     // creation, modification
      b.putInt(timescale).putInt(duration.toInt)
      b.array()
    }
    box("ftyp", "isom   isom".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd))
  }

  /** ISO full box: version 0 + zero flags, then the payload. */
  private def fullBox(tpe: String, payload: Array[Byte]): Array[Byte] =
    box(tpe, Array[Byte](0, 0, 0, 0) ++ payload)

  private def u32s(xs: Long*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(xs.length * 4)
    xs.foreach(x => b.putInt(x.toInt))
    b.array()
  }

  /** MP4 with full sample tables (ISO 14496-12 8.6.2/8.7.3-8.7.5):
    * moov(mvhd, trak(mdia(minf(stbl(stss, stsc, stsz, stco|co64))))).
    * `sizes` = Left((uniformSize, sampleCount)) or Right(perSampleSizes);
    * `audioTrakFirst` prepends a trak with no stss (an audio track) to
    * exercise track selection.
    */
  private def mp4WithSampleTables(sync: Seq[Long], stscRuns: Seq[(Long, Long)],
                                  sizes: Either[(Long, Long), Seq[Long]],
                                  chunkOffs: Seq[Long], useCo64: Boolean = false,
                                  audioTrakFirst: Boolean = false): Array[Byte] = {
    val stss = fullBox("stss", u32s((sync.length.toLong +: sync): _*))
    val stsc = fullBox("stsc", u32s((stscRuns.length.toLong +:
      stscRuns.flatMap { case (fc, spc) => Seq(fc, spc, 1L) }): _*))
    val stsz = sizes match {
      case Left((uniform, n)) => fullBox("stsz", u32s(uniform, n))
      case Right(ss)          => fullBox("stsz", u32s((0L +: ss.length.toLong +: ss): _*))
    }
    val chunkBox =
      if (useCo64) {
        val b = java.nio.ByteBuffer.allocate(4 + chunkOffs.length * 8)
        b.putInt(chunkOffs.length)
        chunkOffs.foreach(b.putLong)
        fullBox("co64", b.array())
      } else fullBox("stco", u32s((chunkOffs.length.toLong +: chunkOffs): _*))
    def trak(withStss: Boolean) = box("trak", box("mdia", box("minf", box("stbl",
      (if (withStss) stss else Array.emptyByteArray) ++ stsc ++ stsz ++ chunkBox))))
    val mvhd = { // minimal v0 movie header, 1000 Hz, 1 s
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(1000)
      b.array()
    }
    box("ftyp", "isomisomiso2".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd) ++
        (if (audioTrakFirst) trak(withStss = false) else Array.emptyByteArray) ++
        trak(withStss = true))
  }

  test("keyframeOffsets: exact sync-sample offsets from hand-built sample tables") {
    // 6 samples in 2 chunks of 3 (one stsc run), explicit sizes
    // 10,20,30,40,50,60; chunks at 1000 and 2000. Sample starts:
    // s1=1000 s2=1010 s3=1030 | s4=2000 s5=2040 s6=2090
    val explicit = mp4WithSampleTables(
      sync = Seq(1L, 3L, 4L, 6L), stscRuns = Seq((1L, 3L)),
      sizes = Right(Seq(10L, 20L, 30L, 40L, 50L, 60L)), chunkOffs = Seq(1000L, 2000L))
    // uniform 100-byte samples, one chunk of 4 at 500: s2 = 600
    val uniform = mp4WithSampleTables(
      sync = Seq(2L), stscRuns = Seq((1L, 4L)),
      sizes = Left((100L, 4L)), chunkOffs = Seq(500L))
    // co64: a chunk offset beyond 2^32, audio trak (no stss) FIRST
    val big = mp4WithSampleTables(
      sync = Seq(1L), stscRuns = Seq((1L, 1L)),
      sizes = Left((7L, 1L)), chunkOffs = Seq(5000000000L),
      useCo64 = true, audioTrakFirst = true)
    val out = Seq(
      (1L, explicit), (2L, uniform), (3L, big),
      (4L, mp4Bytes(1000, 5400)), // mvhd only: no sample tables -> NULL
      (5L, "not a container at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.keyframeOffsets(col("payload")).as("ko"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).toList)).toMap
    assert(out(1L) == List(1000L, 1030L, 2000L, 2090L))
    assert(out(2L) == List(600L))
    assert(out(3L) == List(5000000000L), "co64 offsets past 2^32; audio trak skipped")
    assert(out(4L) == null, "no stss table -> no keyframe TABLE to report")
    assert(out(5L) == null)
  }

  test("keyframeSlices cuts payload bytes at true keyframe offsets") {
    // place a real mdat after the header and point the chunk table at it:
    // 2 keyframes of 9 bytes each, back to back
    val mdatPayload = "KEYFRAME0KEYFRAME1".getBytes("ISO-8859-1")
    val header = mp4WithSampleTables(
      sync = Seq(1L, 2L), stscRuns = Seq((1L, 2L)),
      sizes = Left((9L, 2L)), chunkOffs = Seq(0L)) // sizing pass only
    val dataStart = header.length + 8L // after the mdat box header
    val full = mp4WithSampleTables(
      sync = Seq(1L, 2L), stscRuns = Seq((1L, 2L)),
      sizes = Left((9L, 2L)), chunkOffs = Seq(dataStart)) ++ box("mdat", mdatPayload)
    val slices = Seq((1L, full)).toDF("doc_id", "payload")
      .select(Multimodal.keyframeSlices(col("payload"), sliceLen = 9).as("s"))
      .collect()(0).getSeq[Array[Byte]](0)
      .map(new String(_, "ISO-8859-1")).toList
    assert(slices == List("KEYFRAME0", "KEYFRAME1"))
  }

  test("decodeVideoMeta: exact container duration from hand-built MP4 boxes") {
    val out = Seq(
      (1L, mp4Bytes(1000, 5400)),                 // 5.4 s at ms timescale
      (2L, mp4Bytes(90000, 315000, v1 = true)),   // 3.5 s at 90 kHz, 64-bit duration
      (3L, "definitely not an mp4 container".getBytes("UTF-8")),
      (4L, wavBytes(8000f, 1, 100)))              // valid audio is NOT a video container
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.decodeVideoMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("m.duration_ms"), col("m.timescale_hz"))
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(1) == 5400L && out(1L).getLong(2) == 1000L)
    assert(out(2L).getLong(1) == 3500L && out(2L).getLong(2) == 90000L)
    assert(out(3L).isNullAt(1), "non-container bytes → NULL meta")
    assert(out(4L).isNullAt(1), "WAV bytes must not parse as ISO-BMFF")
  }

  test("decodeVideoBatched agrees bit-for-bit with the expression path") {
    val rows = (0L until 20L).map { i =>
      if (i % 5 == 4) (i, Array.fill[Byte](32)((i % 90).toByte)) // undecodable
      else (i, mp4Bytes(1000 * (1 + (i % 3)).toInt, 1000L + i * 777L, v1 = i % 2 == 1))
    }
    val df = rows.toDF("doc_id", "payload").repartition(4)
    val viaExpr = df
      .select(col("doc_id"), octet_length(col("payload")).cast("long").as("n_bytes"),
        Multimodal.decodeVideoMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("n_bytes"), col("m.duration_ms"), col("m.timescale_hz"))
      .as[DecodedVideo].collect().sortBy(_.doc_id)
    val viaBatch = Multimodal.decodeVideoBatched(df)
      .as[DecodedVideo].collect().sortBy(_.doc_id)
    assert(viaBatch.toList == viaExpr.toList)
    assert(viaBatch.count(_.duration_ms.isEmpty) == 4, "corrupt rows surface as NULL meta")

    val withNull = Seq((1L, mp4Bytes(1000, 250)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeVideoBatched(withNull)
      .as[DecodedVideo].collect().sortBy(_.doc_id)
    assert(out(0).duration_ms.contains(250L))
    assert(out(1) == DecodedVideo(2L, 0L, None, None))
  }

  test("keyframeRanges reports exact (offset, size) pairs from the stsz table") {
    // same layout as the keyframeOffsets pin: sizes 10,20,30,40,50,60 in
    // 2 chunks of 3 at 1000/2000; sync samples 1,3,4,6
    val payload = mp4WithSampleTables(
      sync = Seq(1L, 3L, 4L, 6L), stscRuns = Seq((1L, 3L)),
      sizes = Right(Seq(10L, 20L, 30L, 40L, 50L, 60L)), chunkOffs = Seq(1000L, 2000L))
    val ranges = Seq((1L, payload)).toDF("doc_id", "payload")
      .select(Multimodal.keyframeRanges(col("payload")).as("r"))
      .selectExpr("transform(r, x -> struct(x.kf_offset, x.kf_bytes)) AS r")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(ranges == List((1000L, 10L), (1030L, 30L), (2000L, 40L), (2090L, 60L)))
  }

  /** An MJPEG-in-MP4 container whose mdat holds the given REAL JPEG
    * codestreams back to back, sample tables carrying their true byte
    * ranges, every frame a sync sample.
    */
  private def mjpegContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
    val sizing = mp4WithSampleTables(
      sync = (1L to frames.length.toLong), stscRuns = Seq((1L, frames.length.toLong)),
      sizes = Right(frames.map(_.length.toLong)), chunkOffs = Seq(0L))
    mp4WithSampleTables(
      sync = (1L to frames.length.toLong), stscRuns = Seq((1L, frames.length.toLong)),
      sizes = Right(frames.map(_.length.toLong)),
      chunkOffs = Seq(sizing.length + 8L)) ++ box("mdat", frames.reduce(_ ++ _))
  }

  /** Uniform-gray RGB frame — round-trips the JPEG codec exactly (zero
    * AC coefficients; integer-exact DC), so decoded stats are the input
    * values, not approximations.
    */
  private def grayFrame(w: Int, h: Int, g: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("decodeKeyframeFrames: exact pixel stats on a hand-built MJPEG container") {
    val payload = mjpegContainer(Seq(
      imageBytes(grayFrame(16, 8, 37), "jpg"),
      imageBytes(grayFrame(9, 7, 200), "jpg")))
    val out = Seq((1L, payload)).toDF("doc_id", "payload")
      .select(posexplode(Multimodal.decodeKeyframeFrames(col("payload"))).as(Seq("i", "kf")))
      .select(col("kf.frame.width"), col("kf.frame.height"),
        col("kf.frame.mean_pixel_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List(
      (16L, 8L, 37L * 1000000L / 255L),
      (9L, 7L, 200L * 1000000L / 255L)))
  }

  test("decodeKeyframeFrames matches Bmff.syntheticMjpeg's closed forms") {
    val ids = Seq(0L, 3L, 7L, 40L)
    val out = ids.map(id => (id, Bmff.syntheticMjpeg(id))).toDF("doc_id", "payload")
      .select(col("doc_id"),
        posexplode(Multimodal.decodeKeyframeFrames(col("payload"))).as(Seq("i", "kf")))
      .select(col("doc_id"), col("i"),
        col("kf.frame.width"), col("kf.frame.height"), col("kf.frame.mean_pixel_ppm"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    val expected = ids.flatMap { id =>
      val n = (4 + id % 3).toInt
      (1 to n).filter(_ % 2 == 1).zipWithIndex.map { case (k, i) =>
        (id, i, 8L + (id + 3 * k) % 17, 8L + (2 * id + 5 * k) % 13,
          ((31 * id + 17 * k) % 256) * 1000000L / 255L)
      }
    }
    assert(out == expected)
  }

  test("resizeMeta: exact nearest-neighbor pixel stats on a hand-built PNG") {
    // 4x2 gray pattern, target box 2 -> rw=2, rh=1; NN reads source
    // (x*4//2, y*2//1) = (0,0) and (2,0): grays 10 and 30 -> sum 40
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    val grays = Seq(Seq(10, 20, 30, 40), Seq(50, 60, 70, 80))
    for (y <- 0 until 2; x <- 0 until 4) {
      val g = grays(y)(x); img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = Seq((1L, imageBytes(img, "png")),
      (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .withColumn("m", Multimodal.resizeMeta(col("payload"), target = 2))
      .select(col("doc_id"), col("m.rw"), col("m.rh"), col("m.mean_pixel_ppm"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((out(1L).getLong(1), out(1L).getLong(2)) == (2L, 1L))
    assert(out(1L).getLong(3) == (10L + 30L) * 1000000L / (255L * 2L))
    assert(out(2L).isNullAt(1), "non-image bytes → NULL resize meta")
  }

  test("resizeMeta matches Png.syntheticGradient's closed forms") {
    val ids = Seq(0L, 5L, 23L, 100L)
    val out = ids.map(id => (id, Png.syntheticGradient(id))).toDF("doc_id", "payload")
      .withColumn("m", Multimodal.resizeMeta(col("payload"), target = 8))
      .select(col("doc_id"), col("m.rw"), col("m.rh"), col("m.mean_pixel_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    val expected = ids.map { id =>
      val w = (8 + id % 17).toInt; val h = (8 + 2 * id % 13).toInt
      val longest = math.max(w, h)
      val rw = math.max(1, w * 8 / longest); val rh = math.max(1, h * 8 / longest)
      val sum = (for (y <- 0 until rh; x <- 0 until rw)
        yield (7L * (x * w / rw) + 13L * (y * h / rh) + id) % 256).sum
      (id, rw.toLong, rh.toLong, sum * 1000000L / (255L * rw * rh))
    }
    assert(out == expected)
  }

  test("decodeKeyframeFrames: non-JPEG samples and >2GiB offsets yield NULL frames") {
    // sync sample bytes that are NOT a JPEG codestream
    val junk = mjpegContainer(Seq("certainly not a jpeg frame".getBytes("UTF-8")))
    // a co64 keyframe past the int-addressable range: must be a NULL
    // frame, not an ANSI cast overflow error
    val far = mp4WithSampleTables(
      sync = Seq(1L), stscRuns = Seq((1L, 1L)),
      sizes = Left((100L, 1L)), chunkOffs = Seq(5000000000L), useCo64 = true)
    val out = Seq((1L, junk), (2L, far)).toDF("doc_id", "payload")
      .select(col("doc_id"),
        posexplode(Multimodal.decodeKeyframeFrames(col("payload"))).as(Seq("i", "kf")))
      .select(col("doc_id"), col("kf.frame").isNull.as("frame_null"),
        col("kf.kf_offset"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(out(1L) == (true, out(1L)._2), "non-JPEG sample decodes to NULL frame")
    assert(out(2L) == (true, 5000000000L), "unaddressable offset is NULL, not an error")
  }

  test("audioEnergyContour: windows reconcile with pcm stats; partial tail; junk -> NULL") {
    import org.apache.spark.sql.functions.{col, posexplode}
    // id 8 -> n = 64 + 8%33 = 72 samples = 4 full windows + one 8-sample tail
    val df = Seq((8L, graft.ext.Wav.synthetic(8L)),
        (9L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val rows = df.filter(col("doc_id") === 8L)
      .select(posexplode(Multimodal.audioEnergyContour(col("payload"), 16)))
      .select(col("pos"), col("col.n"), col("col.energy"))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toList
    assert(rows.map(_._2) == List(16L, 16L, 16L, 16L, 8L), s"got $rows")
    // the contour must reconcile EXACTLY with the clip-level stats (the
    // shared scan makes this structural, the assert keeps it honest)
    val stats = df.filter(col("doc_id") === 8L)
      .select(Multimodal.audioPcmStats(col("payload")).as("st"))
      .select("st.n_samples", "st.sum_sq").as[(Long, Long)].head()
    assert((rows.map(_._2).sum, rows.map(_._3).sum) == stats)
    // undecodable payload -> NULL array, never a crash
    assert(df.filter(col("doc_id") === 9L)
      .select(Multimodal.audioEnergyContour(col("payload"), 16).isNull)
      .as[Boolean].head())
  }

  test("imageDHash: exact bit pattern on a hand-built 9×8 image") {
    // 9×8 grid samples the identity: even rows brighten left→right
    // (all 8 bits set), odd rows darken (no bits) → 0x00FF00FF00FF00FF
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val g = if (y % 2 == 0) x * 20 else (8 - x) * 20
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    // constant image: no STRICT brightening anywhere → hash 0
    val flat = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) flat.setRGB(x, y, 0x808080)

    val out = Seq(
        (1L, imageBytes(img, "png")),
        (2L, imageBytes(img, "bmp")), // same pixels, different container
        (3L, imageBytes(flat, "png")),
        (4L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.imageDHash(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).contains(0x00ff00ff00ff00ffL), s"got ${out(1L).map(_.toHexString)}")
    assert(out(2L) == out(1L), "dHash is a pixel property, not a byte property")
    assert(out(3L).contains(0L), "strictly-brighter: flat image has no set bits")
    assert(out(4L).isEmpty, "non-image bytes → NULL hash")
  }

  test("imageDHash downsampling: noise fixture variants land at small Hamming distances") {
    // one pattern key (pk=4): base (id 20), sparse flip (21), dense (22)
    val hashes = Seq(20L, 21L, 22L)
      .map(id => id -> Png.syntheticNoise(id)).toDF("doc_id", "payload")
      .select(col("doc_id"), Multimodal.imageDHash(col("payload")).as("h"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sparse = ham(hashes(20L), hashes(21L))
    val dense = ham(hashes(20L), hashes(22L))
    assert(sparse < dense,
      s"sparse perturbation ($sparse bits) must disturb fewer bits than dense ($dense)")
    assert(dense < 40, "even the dense variant shares the base's structure")
    // distinct pattern keys have near-independent hashes — far apart
    val other = Seq(25L).map(id => id -> Png.syntheticNoise(id))
      .toDF("doc_id", "payload")
      .select(Multimodal.imageDHash(col("payload"))).as[Long].head()
    assert(ham(hashes(20L), other) > 10, "cross-key hashes are dissimilar")
  }
}
