package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("minMaxNormalizePpm: per-dimension extremes, constant dims, NULL vectors") {
    val emb = Seq(
      (0L, Some(Array(0f, 10f, 5f))),
      (1L, Some(Array(4f, 10f, 7f))),
      (2L, Some(Array(2f, 10f, 9f))),
      (3L, None) // NULL vector contributes nothing and emits nothing
    ).toDF("vec_id", "embedding")
    val got = Quantize.minMaxNormalizePpm(emb, col("vec_id"), col("embedding"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // dim 0: min 0, max 4 -> 0, 1000000, 500000
    assert(got((0L, 0L)) == 0L && got((1L, 0L)) == 1000000L && got((2L, 0L)) == 500000L)
    // dim 1 is constant -> 0 everywhere (never a divide-by-zero NULL)
    assert(Seq(0L, 1L, 2L).forall(v => got((v, 1L)) == 0L))
    // dim 2: min 5, max 9 -> 0, 500000, 1000000
    assert(got((0L, 2L)) == 0L && got((1L, 2L)) == 500000L && got((2L, 2L)) == 1000000L)
    assert(got.size == 9, "NULL vector must not emit rows")
  }

  test("dimMinMax is bounded by dimensionality, not rows") {
    val emb = (0 until 200).map(i => (i.toLong, Array(i.toFloat, -i.toFloat)))
      .toDF("vec_id", "embedding")
    val stats = Quantize.dimMinMax(emb, col("embedding"))
    assert(stats.toSeq == Seq((0.0, 199.0), (-199.0, 0.0)))
  }
}
