package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(0f, 0.9f, 0.1f, 0f)),
    (4L, Array(-1f, 0f, 0f, 0f)),
    (5L, Array(1f, 0f, 0f, 0f)) // exact duplicate of vec 0 (bucket-identical)
  ).toDF("vec_id", "embedding")

  test("topKBruteForce ranks by cosine with deterministic tie-break") {
    val out = SimSearch.topKBruteForce(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // vec 5 is an exact duplicate (cos=1) and outranks vec 1 (cos≈0.994)
    assert(out.map(_._2).toList == List(5L, 1L), s"got ${out.toList}")
    assert(out.head._3 == 1.0)
  }

  test("topKLsh finds the exact-duplicate neighbor (identical bucket by construction)") {
    val out = SimSearch.topKLsh(vecs, vecs.filter(col("vec_id") === 0), k = 2, dim = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2).contains(5L), s"duplicate vector must share the bucket: ${out.toList}")
  }

  test("topKIvf probes centroid lists and reranks exactly") {
    val out = SimSearch.topKIvf(vecs, vecs.filter(col("vec_id") === 0), k = 2, nlist = 2, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.nonEmpty && out.head._2 == 5L)
  }

  test("VectorOps cosine/dot/l2 compute in double precision") {
    import graft.functions.VectorOps
    val df = Seq((Array(3f, 4f), Array(4f, 3f))).toDF("a", "b")
      .select(
        VectorOps.dot(col("a"), col("b")).as("dot"),
        VectorOps.norm(col("a")).as("na"),
        VectorOps.cosine(col("a"), col("b")).as("cos"),
        VectorOps.l2(col("a"), col("b")).as("l2"))
    val r = df.collect().head
    assert(r.getAs[Double]("dot") == 24.0)
    assert(r.getAs[Double]("na") == 5.0)
    assert(math.abs(r.getAs[Double]("cos") - 24.0 / 25.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("l2") - math.sqrt(2.0)) < 1e-12)
  }
}
