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
}
