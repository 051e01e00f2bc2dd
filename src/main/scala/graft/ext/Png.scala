package graft.ext

/** Deterministic synthetic PNG fixtures for the real-pixel gates: PNG is
  * LOSSLESS, so — unlike the MJPEG gate's uniform-frame trick
  * ([[Bmff.syntheticMjpeg]]) — arbitrary per-pixel patterns survive
  * encode→decode bit-exactly, and the `q143` oracle can recompute
  * statistics of a NON-uniform gradient that would expose a resampler
  * reading the wrong source pixels (a uniform image cannot: every
  * resample of it has the same mean).
  */
object Png {

  /** Closed-form gradient PNG for one doc id (the `q143` oracle mirrors
    * these formulas verbatim — change BOTH or neither):
    *  - `w = 8 + id % 17`, `h = 8 + (2·id) % 13`;
    *  - pixel `(x, y)` is gray `g(x, y) = (7x + 13y + id) % 256`.
    * The x/y coefficients are coprime to each other and the modulus
    * walk, so transposed axes, flipped rows, or off-by-one sampling all
    * shift the gradient and break the oracle's mean. Pure function of
    * `id` — safe on executors.
    */
  def syntheticGradient(id: Long): Array[Byte] = {
    val w = (8 + Math.floorMod(id, 17)).toInt
    val h = (8 + Math.floorMod(2L * id, 13)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = Math.floorMod(7L * x + 13L * y + id, 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** uint32 from the first 8 hex chars of `md5(s)` — the JVM twin of the
    * oracle's `('0x'||substr(md5(s),1,8))::BIGINT`, and the same
    * primitive [[graft.functions.Hashing.md5Hash32]] evaluates in-plan.
    * Used only by fixture SYNTHESIS (pure function of the doc id), so a
    * fresh MessageDigest per call is fine.
    */
  def md5Num(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Closed-form NOISE PNG for the perceptual-dedup gates — unlike
    * [[syntheticGradient]] (whose monotone rows make every dHash nearly
    * all-ones), per-pixel md5 grays give near-iid difference signs, so
    * fingerprints are diverse ACROSS pattern keys and near-dup detection
    * is non-trivial. The `q207`/`q208` oracles mirror these formulas
    * verbatim (change BOTH or neither):
    *  - pattern key `pk = id div 5`, variant `v = id mod 5` (only
    *    `v < 3` documents get an image — three variants per key);
    *  - `w = 16 + pk % 9`, `h = 16 + pk % 7`; dims depend on `pk` ONLY,
    *    so variants of one key sample the same pixel grid;
    *  - base gray `g₀(x, y) = md5Num("<pk>:<x>:<y>") % 256`;
    *  - `v = 0`: exact base. `v = 1`: pixels with
    *    `(31x + 17y) % 29 == 0` flip to `(g₀ + 128) % 256` — a sparse
    *    perturbation (a near-duplicate: re-encode/watermark analog).
    *    `v = 2`: same flip where `(31x + 17y) % 5 == 0` — dense (a
    *    same-subject-different-image analog).
    * Pure function of `id` — safe on executors.
    */
  def syntheticNoise(id: Long): Array[Byte] = {
    require(Math.floorMod(id, 5L) < 3, s"doc $id carries no noise image")
    val pk = Math.floorDiv(id, 5L)
    val v = Math.floorMod(id, 5L)
    val w = (16 + Math.floorMod(pk, 9L)).toInt
    val h = (16 + Math.floorMod(pk, 7L)).toInt
    val mod = if (v == 1) 29L else 5L
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g0 = (md5Num(s"$pk:$x:$y") % 256L).toInt
        val g =
          if (v != 0 && (31L * x + 17L * y) % mod == 0) (g0 + 128) % 256
          else g0
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
