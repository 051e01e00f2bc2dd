package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the Sennrich et al. (2016) worked example, weighted by repetition
  private def toyCorpus = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)
  ).toDF("doc_id", "text")

  test("trainMerges reproduces the classic worked example, deterministically") {
    val merges = Bpe.trainMerges(toyCorpus, numMerges = 4)
    // pair counts: (e,s)=9 ties (s,t)=9 -> lexicographic; then (es,t)=9;
    // then (l,o)=7; then (lo,w)=7
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // partition-invariant: training reads a deterministic top-k of a
    // hash aggregate, so placement must not change the result
    val merges2 = Bpe.trainMerges(toyCorpus.repartition(7), numMerges = 4)
    assert(merges2 == merges)
  }

  test("segment applies merges greedily by rank: lowest -> [low, est]") {
    val merges = Bpe.trainMerges(toyCorpus, numMerges = 4)
    def seg(s: String): List[String] =
      Seq(s).toDF("text").select(Bpe.segment(col("text"), merges).as("t"))
        .collect().head.getAs[collection.Seq[String]]("t").toList
    assert(seg("lowest") == List("low", "est"))
    assert(seg("newest") == List("n", "e", "w", "est"))
    assert(seg("low lowest") == List("low", "low", "est"))
    // unseen characters stay as singletons
    assert(seg("xyz") == List("x", "y", "z"))
    assert(seg("") == Nil)
    val cnt = Seq("low lowest").toDF("text")
      .select(Bpe.tokenCount(col("text"), merges).as("n"))
      .collect().head.getLong(0)
    assert(cnt == 3L)
  }

  test("segmentation is lossless and bounded on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainMerges(docs, numMerges = 50)
    assert(merges.size == 50)
    val checked = docs.select(
      TextOps.tokenCount(col("text")).as("ws_tokens"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"),
      Bpe.tokenCount(col("text"), merges).as("bpe_tokens"),
      // lossless: concatenating the subwords rebuilds the spaceless text
      (concat_ws("", Bpe.segment(col("text"), merges)) ===
        regexp_replace(col("text"), " ", "")).as("lossless"))
    val bad = checked.filter(!col("lossless") ||
      col("bpe_tokens") > col("n_chars") || col("bpe_tokens") < col("ws_tokens"))
    assert(bad.isEmpty,
      s"${bad.count()} docs break the lossless/bounds invariant")
    // merges must actually compress: strictly fewer tokens than characters
    val agg = checked.agg(sum("bpe_tokens"), sum("n_chars")).head()
    assert(agg.getLong(0) < agg.getLong(1))
  }

  test("sampleMerges (the frozen q142 table) segments pinned words exactly") {
    // hand-derived under the frozen rule ranks: "order" collapses via
    // er(0) -> or(1) -> der(20) -> order(21); "window" via in(2) ->
    // ow(3) -> dow(17) -> indow(18) -> window(19); "zzz" hits no rule
    val out = Seq(("order window zzz", 1L)).toDF("text", "id")
      .select(Bpe.segment(col("text"), Bpe.sampleMerges).as("toks"),
        Bpe.tokenCount(col("text"), Bpe.sampleMerges).as("n"))
      .head()
    assert(out.getSeq[String](0).toList == List("order", "window", "z", "z", "z"))
    assert(out.getLong(1) == 5L)
    // the frozen table must stay internally valid: every rule's two
    // components are single chars or products of strictly earlier rules
    // (the property the q142 oracle's one-step-at-a-time recursion rests on)
    val products = Bpe.sampleMerges.zipWithIndex.map { case ((a, b), i) => (a + b, i) }.toMap
    Bpe.sampleMerges.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).foreach { c =>
        assert(c.length == 1 || products.getOrElse(c, Int.MaxValue) < i,
          s"rule $i ($a,$b): component '$c' is not buildable before rank $i")
      }
    }
  }
}
