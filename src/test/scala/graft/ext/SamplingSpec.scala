package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (0L until 2000L).map { i =>
    (i, s"src${(i % 4)}")
  }.toDF("doc_id", "source")

  test("hashSample keeps roughly the requested fraction, deterministically") {
    val a = Sampling.hashSample(corpus, col("doc_id"), fractionBp = 1000)
      .select("doc_id").as[Long].collect().sorted.toList
    val b = Sampling.hashSample(corpus, col("doc_id"), fractionBp = 1000)
      .select("doc_id").as[Long].collect().sorted.toList
    assert(a == b, "hash sampling must be reproducible")
    assert(a.size > 130 && a.size < 270, s"~10% of 2000 expected, got ${a.size}")
  }

  test("mixtureSample: integer weight part is exact, fractional part is hash-decided") {
    val out = Sampling.mixtureSample(corpus, col("doc_id"), col("source"),
      Map("src0" -> 2500, "src1" -> 500, "src2" -> 0), defaultMilli = 1000)
      .groupBy("source").agg(count(lit(1)).as("n"), max(col("copy")).as("maxc"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // src0 (500 docs, 2.5x): every doc emits >= 2 copies, ~half emit 3
    val (n0, max0) = out("src0")
    assert(max0 == 3L)
    assert(n0 >= 1000L && n0 <= 1500L, s"2.5x of 500 docs in [1000,1500], got $n0")
    assert(n0 > 1150L && n0 < 1350L, s"~1250 expected, got $n0")
    // src1 (0.5x): subsample, no doc repeated
    val (n1, max1) = out("src1")
    assert(max1 == 1L)
    assert(n1 > 180L && n1 < 320L, s"~250 of 500 expected, got $n1")
    // src2 (0x): dropped entirely
    assert(!out.contains("src2"))
    // src3 unlisted -> defaultMilli 1000 -> exactly one copy each
    assert(out("src3") == (500L, 1L))
  }

  test("capPerKey keeps exactly n per key, deterministically, partition-invariant") {
    val capped = Sampling.capPerKey(corpus, col("source"), col("doc_id"), n = 7)
    val perKey = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perKey.values.toSet == Set(7L), s"every 500-doc source capped to 7: $perKey")

    val a = capped.select("doc_id").as[Long].collect().sorted.toList
    val b = Sampling.capPerKey(corpus.repartition(17), col("source"), col("doc_id"), n = 7)
      .select("doc_id").as[Long].collect().sorted.toList
    assert(a == b, "kept set must not depend on input partitioning")

    // under-cap keys pass through whole
    val tiny = corpus.filter(col("doc_id") < 20)
    assert(Sampling.capPerKey(tiny, col("source"), col("doc_id"), n = 7).count() == 20L)
  }

  test("capPerKey selection is hash-uniform, not an id prefix") {
    val kept = Sampling.capPerKey(corpus, col("source"), col("doc_id"), n = 100)
      .filter(col("source") === "src0").select("doc_id").as[Long].collect()
    // of src0's 500 docs (ids ≡ 0 mod 4, up to 1996), a uniform 100-draw
    // should straddle the id range, not cluster at the low end
    assert(kept.count(_ < 1000L) > 20 && kept.count(_ >= 1000L) > 20,
      s"hash order must spread across the id range: low=${kept.count(_ < 1000L)}")
  }

  test("capPerKey plans as a partial WindowGroupLimit before the key shuffle") {
    val capped = Sampling.capPerKey(corpus, col("source"), col("doc_id"), n = 7)
    capped.collect()
    val p = capped.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=n must trigger InferWindowGroupLimit:\n${p.take(800)}")
    assert(p.contains("Partial"),
      "the limit must prune map-side BEFORE the key shuffle — that bound is the operator's skew story")
  }

  test("mixtureSample copies are indexed 1..n for downstream spreading") {
    val copies = Sampling.mixtureSample(corpus.filter(col("source") === "src0"),
      col("doc_id"), col("source"), Map("src0" -> 3000))
      .groupBy("doc_id").agg(collect_list(col("copy")).as("cs"))
      .select("cs").as[Seq[Long]].collect()
    copies.foreach(cs => assert(cs.sorted == Seq(1L, 2L, 3L)))
  }
}
