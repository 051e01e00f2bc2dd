package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** JVM reference interleave for cross-checking the column expression. */
  private def ref(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zKey: hand values, exhaustive 4-bit cross-check, high bits ignored") {
    // a=5 (101) -> positions 0,2,4 = 1+0+16; b=3 (011) -> positions 1,3 = 2+8
    assert(ref(5L, 3L, 3) == 27L)
    val pairs = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zKey(col("a"), col("b"), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == ref(a, b, 4), s"($a, $b): got $z, want ${ref(a, b, 4)}")
    }
    // bijective over the 4-bit square: 256 distinct keys covering 0..255
    assert(got.map(_._3).distinct.length == 256)
    assert(got.map(_._3).min == 0L && got.map(_._3).max == 255L)
    // bits above the width are ignored (caller maps the domain)
    val high = Seq((16L, 0L)).toDF("a", "b")
      .select(ZOrder.zKey(col("a"), col("b"), 4)).as[Long].head()
    assert(high == 0L)
  }

  test("zKey prefixes are quadrant ids: top bits bound BOTH dimensions") {
    // for 4-bit keys, z >> 6 identifies the 4x4 coarse cell: every key
    // sharing a prefix sits in a 4-wide range of each dimension — the
    // property zone-map pruning on a z-sorted file relies on
    val pairs = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    pairs.foreach { case (a, b) =>
      // the key's top bits are exactly the interleave of the coarse
      // coordinates, so a shared prefix pins a sub-square in (a, b)
      assert((ref(a, b, 4) >> 4) == ref(a >> 2, b >> 2, 2),
        s"prefix of z($a,$b) must equal z of the coarse coords")
    }
  }

  test("withHilbertKey: bijection, unit-step continuity, matches the reference walk") {
    // plain-Scala reference of the classic xy2d
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      val n = 1L << bits
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val bits = 4
    val grid = (for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)).toDF("a", "b")
    val keys = ZOrder.withHilbertKey(grid, col("a"), col("b"), bits, "h")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // matches the reference at every cell
    keys.foreach { case ((a, b), h) => assert(h == xy2d(bits, a, b), s"($a,$b)") }
    // bijection onto [0, 256)
    assert(keys.values.toSet == (0L until 256L).toSet)
    // the Hilbert property z-order lacks: consecutive indices are
    // GRID-ADJACENT (|da| + |db| = 1) — the locality zone maps exploit
    val byD = keys.map(_.swap)
    (0L until 255L).foreach { d =>
      val (a1, b1) = byD(d); val (a2, b2) = byD(d + 1)
      assert(math.abs(a1 - a2) + math.abs(b1 - b2) == 1L, s"jump at d=$d")
    }
  }

  test("skippingStats: linear prunes only its sort dimension, z-order prunes both") {
    // the full 16x16 grid in 16 files of 16 rows each
    val grid = (for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b))
      .toDF("a", "b")
    def run(aLo: Long, aHi: Long, bLo: Long, bHi: Long) =
      ZOrder.skippingStats(grid, col("a"), col("b"), bits = 4, files = 16,
          aLo, aHi, bLo, bHi)
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
    // b-slice (b < 4, all a): the linear (a, b) sort scatters b across
    // every file; z-order confines b < 4 to the quadrant-aligned files
    val bSlice = run(0L, 15L, 0L, 3L)
    assert(bSlice("linear") == (("linear", 16L, 16L, 256L, 64L)),
      s"${bSlice("linear")}")
    // z 4-bit quadrants: b<4 pins odd key bits 3..7 -> 4 of 16 files
    assert(bSlice("zorder") == (("zorder", 16L, 4L, 64L, 64L)),
      s"${bSlice("zorder")}")
    // a-slice (a < 4): the linear sort prunes it perfectly (4 files);
    // z-order also reads exactly its 4 quadrant files on the full grid
    val aSlice = run(0L, 3L, 0L, 15L)
    assert(aSlice("linear")._3 == 4L && aSlice("zorder")._3 == 4L, s"$aSlice")
    assert(aSlice("linear")._5 == 64L && aSlice("zorder")._5 == 64L)
  }

  test("skippingForecast: window and histogram tile paths are bit-identical") {
    // heavy key ties (a % 3) force the (a, b) struct tie-break through
    // both paths; threshold 0 forces the histogram path, the default
    // takes the bounded window path on this small frame
    val frame = (for (a <- 0L until 12L; b <- 0L until 6L) yield (a, b))
      .toDF("a", "b").withColumn("__k", col("a") % 3)
    def run(thr: Long) =
      ZOrder.skippingForecast(Seq(("t", frame)), files = 5,
          aLo = 2L, aHi = 9L, bLo = 1L, bHi = 4L, histTileThreshold = thr)
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(run(0L) == run(ZOrder.HistTileThreshold))
    assert(run(0L).nonEmpty)
  }
}
