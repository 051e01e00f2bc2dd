package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // (id, grp, tokens) — grp "x" fills bins of 100: 60+30 -> bin 0,
    // then 50 starts at tok_before=90 -> still bin 0 (overflow), then
    // 80 starts at 140 -> bin 1, 200 starts at 220 -> bin 2
    (1L, "x", 60L), (2L, "x", 30L), (3L, "x", 50L), (4L, "x", 80L), (5L, "x", 200L),
    (6L, "y", 100L), (7L, "y", 1L)
  ).toDF("doc_id", "grp", "n_tokens")

  test("assignBins: bin = floor(tokens-before / capacity), per group") {
    val out = Packing.assignBins(docs, col("grp"), col("doc_id"), col("n_tokens"), 100L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L,
      6L -> 0L, 7L -> 1L))
  }

  test("packSummary: per-bin doc counts and token totals; overflow bounded by one doc") {
    val out = Packing.packSummary(docs, col("grp"), col("doc_id"), col("n_tokens"), 100L)
      .select(col("grp"), col("bin"), col("n_docs"), col("sum_tokens"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("x", 0L, 3L, 140L), // overflows 100 by doc 3's 50 tokens minus the 10 headroom
      ("x", 1L, 1L, 80L),
      ("x", 2L, 1L, 200L),
      ("y", 0L, 1L, 100L),
      ("y", 1L, 1L, 1L)))
    // every bin's overflow beyond capacity is smaller than its last doc
    val byBin = Packing.assignBins(docs, col("grp"), col("doc_id"), col("n_tokens"), 100L)
      .select(col("grp"), col("bin"), col("n_tokens"), col("tok_before"))
      .as[(String, Long, Long, Long)].collect()
    byBin.foreach { case (_, bin, _, tokBefore) =>
      assert(tokBefore / 100 == bin)
    }
  }

  test("assignBins is deterministic across runs") {
    val a = Packing.assignBins(docs, col("grp"), col("doc_id"), col("n_tokens"), 100L)
      .collect().map(_.toString).sorted.toList
    val b = Packing.assignBins(docs, col("grp"), col("doc_id"), col("n_tokens"), 100L)
      .collect().map(_.toString).sorted.toList
    assert(a == b)
  }
}
