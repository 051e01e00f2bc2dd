package graft.ext

/** Deterministic synthetic ISO-BMFF (MP4) containers for the keyframe
  * gate (`q107_keyframe_offsets`): real `moov` box trees with full
  * sample tables (`stss`/`stsc`/`stsz`/`stco`|`co64`, ISO 14496-12
  * §8.6.2 / §8.7.3–8.7.5) whose keyframe byte offsets are a CLOSED FORM
  * of the doc id — the DuckDB oracle recomputes the expected offsets
  * from the formulas below without touching bytes, while the Spark side
  * must actually walk the container byte-for-byte
  * ([[graft.functions.VideoMeta]] via [[Multimodal.keyframeOffsets]]).
  * A parser bug (endianness, run expansion, box skip, co64 width)
  * surfaces as an oracle mismatch instead of hiding behind a
  * spec-builder that shares code with the parser.
  *
  * Parameterization, all 1-based sample numbering (the `q107` oracle
  * SQL mirrors these formulas verbatim — change BOTH or neither):
  *  - `n = 6 + id % 5` samples;
  *  - `sz(k) = 50 + (id*7 + k*13) % 40` bytes for `k = 1..n`;
  *  - sync samples at `k ≡ 1 (mod 3)` (every 3rd, starting at 1);
  *  - two chunks via two `stsc` runs: samples `1..n/2` then the rest;
  *  - chunk bases `base1 = 4096 + id % 100` (+ 2³² on odd ids, written
  *    as a 64-bit `co64` table) and `base2 = base1 + 65536`.
  * Offset of sample k = its chunk's base + Σ sizes of prior samples in
  * the same chunk. Odd ids exercise the co64 path past 2³²; even ids
  * the 32-bit stco path.
  */
object Bmff {

  /** One ISO-BMFF box: 32-bit big-endian size + fourcc + payload. */
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(payload.length + 8)
    b.putInt(payload.length + 8).put(tpe.getBytes("ISO-8859-1")).put(payload)
    b.array()
  }

  /** ISO full box: version 0 + zero flags, then the payload. */
  private def fullBox(tpe: String, payload: Array[Byte]): Array[Byte] =
    box(tpe, Array[Byte](0, 0, 0, 0) ++ payload)

  private def u32s(xs: Long*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(xs.length * 4)
    xs.foreach(x => b.putInt(x.toInt))
    b.array()
  }

  /** The synthetic container for one doc id (see object doc for the
    * closed-form layout). Pure function of `id` — safe to call on
    * executors, no shared state.
    */
  def synthetic(id: Long): Array[Byte] = {
    val n = (6 + Math.floorMod(id, 5)).toInt
    val sizes = (1 to n).map(k => 50L + Math.floorMod(id * 7 + k * 13, 40))
    val sync = (1L to n.toLong by 3)
    val m = n / 2
    val co64 = Math.floorMod(id, 2) == 1
    val base1 = 4096L + Math.floorMod(id, 100) + (if (co64) 4294967296L else 0L)
    val base2 = base1 + 65536L

    val stss = fullBox("stss", u32s((sync.length.toLong +: sync): _*))
    // two runs: chunk 1 carries m samples, chunk 2 the remaining n - m
    val stsc = fullBox("stsc", u32s(
      2L, 1L, m.toLong, 1L, 2L, (n - m).toLong, 1L))
    val stsz = fullBox("stsz", u32s((0L +: n.toLong +: sizes): _*))
    val chunkBox =
      if (co64) {
        val b = java.nio.ByteBuffer.allocate(4 + 2 * 8)
        b.putInt(2).putLong(base1).putLong(base2)
        fullBox("co64", b.array())
      } else fullBox("stco", u32s(2L, base1, base2))
    val trak = box("trak", box("mdia", box("minf", box("stbl",
      stss ++ stsc ++ stsz ++ chunkBox))))
    val mvhd = { // minimal v0 movie header: 1000 Hz timescale, 1 s
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(1000)
      b.array()
    }
    box("ftyp", "isomisomiso2".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd) ++ trak)
  }

  /** One uniform-gray RGB JPEG frame via the JDK encoder. Uniform frames
    * are the key to an EXACT oracle on a lossy codec: every 8×8 block of
    * a constant image has zero AC coefficients and a DC term the integer
    * DCT computes exactly, so encode→decode returns precisely the input
    * gray level `g` at any size/quality (verified over all 256 levels ×
    * 6 sizes including non-multiples of 8). `TYPE_INT_RGB`, not
    * `TYPE_BYTE_GRAY`: the gray color space goes through a linear→sRGB
    * conversion in `getRGB` that breaks value preservation.
    */
  private def jpegFrame(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** A playable-shape MJPEG-in-MP4 container for one doc id: real JPEG
    * codestreams in an `mdat` box, sample tables whose offsets/sizes are
    * the frames' TRUE byte positions (sizes vary with the entropy coder's
    * output — no closed form), sync samples at every odd frame. The
    * closed form the `q140` oracle recomputes is the DECODED side
    * (1-based frame k):
    *  - `n = 4 + id % 3` frames; keyframes at odd `k` (`kf_idx = (k+1)/2`);
    *  - `width(k)  = 8 + (id + 3k) % 17`;
    *  - `height(k) = 8 + (2·id + 5k) % 13`;
    *  - `gray(k)   = (31·id + 17k) % 256` → `mean_pixel_ppm =
    *    gray·1000000 / 255` (floor), exact because uniform JPEG frames
    *    round-trip losslessly (see [[jpegFrame]]).
    * So the oracle never touches bytes, while the Spark side must walk
    * the container, cut each sync sample's exact range, and actually
    * decode the JPEG — an off-by-one in any table breaks the decode (no
    * SOI marker at a wrong offset) rather than shifting stats silently.
    */
  def syntheticMjpeg(id: Long): Array[Byte] = {
    val n = (4 + Math.floorMod(id, 3)).toInt
    val frames = (1 to n).map { k =>
      jpegFrame(
        8 + Math.floorMod(id + 3L * k, 17).toInt,
        8 + Math.floorMod(2L * id + 5L * k, 13).toInt,
        Math.floorMod(31L * id + 17L * k, 256).toInt)
    }
    val ftyp = box("ftyp", "isomisomiso2".getBytes("ISO-8859-1"))
    val mdat = box("mdat", frames.reduce(_ ++ _))
    val firstFrameOff = ftyp.length + 8L // mdat payload starts after its header
    val sync = (1L to n.toLong by 2)
    val stss = fullBox("stss", u32s((sync.length.toLong +: sync): _*))
    // single chunk holding all n samples
    val stsc = fullBox("stsc", u32s(1L, 1L, n.toLong, 1L))
    val stsz = fullBox("stsz",
      u32s((0L +: n.toLong +: frames.map(_.length.toLong)): _*))
    val stco = fullBox("stco", u32s(1L, firstFrameOff))
    val trak = box("trak", box("mdia", box("minf", box("stbl",
      stss ++ stsc ++ stsz ++ stco))))
    val mvhd = { // minimal v0 movie header: 1000 Hz timescale, 1 s
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(1000)
      b.array()
    }
    ftyp ++ mdat ++ box("moov", box("mvhd", mvhd) ++ trak)
  }
}
