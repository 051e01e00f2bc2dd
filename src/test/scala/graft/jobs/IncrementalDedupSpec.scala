package graft.jobs

import java.nio.file.Files

import graft.SparkTestBase

class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("batches dedup against accumulated history, index grows by accepted docs") {
    val indexDir = Files.createTempDirectory("graft_incdedup_").toString + "/index"

    // batch 1: one in-batch dup (4 docs, 3 distinct)
    val b1 = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"))
      .toDF("doc_id", "text")
    val a1 = IncrementalDedup.ingest(b1, indexDir)
      .select("doc_id").as[Long].collect().sorted
    assert(a1.toList == List(1L, 2L, 4L), "in-batch dup 3 must lose to min-id 1")
    assert(IncrementalDedup.indexSize(spark, indexDir) == 3L)

    // batch 2: one cross-batch dup ("bbb"), one in-batch pair, one new doc
    val b2 = Seq((10L, "bbb"), (11L, "ddd"), (12L, "ddd"), (13L, "eee"))
      .toDF("doc_id", "text")
    val a2 = IncrementalDedup.ingest(b2, indexDir)
      .select("doc_id").as[Long].collect().sorted
    assert(a2.toList == List(11L, 13L),
      "cross-batch dup and in-batch loser must both drop")
    assert(IncrementalDedup.indexSize(spark, indexDir) == 5L)

    // batch 3: all previously seen -> nothing accepted, index unchanged
    val b3 = Seq((20L, "aaa"), (21L, "ddd"), (22L, "eee")).toDF("doc_id", "text")
    assert(IncrementalDedup.ingest(b3, indexDir).isEmpty)
    assert(IncrementalDedup.indexSize(spark, indexDir) == 5L)
  }

  test("near-dup ingest flags cross-batch candidates via the band-key index") {
    import org.apache.spark.sql.functions.col
    val indexDir = Files.createTempDirectory("graft_incnd_").toString + "/index"
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"

    // batch 1 seeds the index; nothing can be a cross-batch hit yet
    val f1 = IncrementalDedup.ingestNearDup(
      Seq((1L, base), (2L, far)).toDF("doc_id", "text"), indexDir)
    assert(f1.filter(col("near_dup_hit")).isEmpty)

    // batch 2: a near-dup of doc 1, an exact copy of doc 2, and a new doc
    val f2 = IncrementalDedup.ingestNearDup(
      Seq((10L, near), (11L, far), (12L, "totally different text right here"))
        .toDF("doc_id", "text"), indexDir)
      .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().toMap
    assert(f2 == Map(10L -> true, 11L -> true, 12L -> false), s"got $f2")

    // batch 3: near-dup of the batch-2 newcomer is now a hit too
    val f3 = IncrementalDedup.ingestNearDup(
      Seq((20L, "totally different text right there")).toDF("doc_id", "text"), indexDir)
      .select("near_dup_hit").as[Boolean].collect()
    assert(f3.toList == List(true))
  }

  test("a failed durable write leaves the index untouched, so the retry re-admits") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_incretry_").toString
    val b = Seq((1L, "retry me please"), (2L, "other doc")).toDF("doc_id", "text")
    intercept[RuntimeException] {
      IncrementalDedup.ingest(b, root + "/fp",
        persistOutput = _ => throw new RuntimeException("durable write failed"))
    }
    assert(IncrementalDedup.indexSize(spark, root + "/fp") == 0L,
      "index must not advance past a failed output write")
    assert(IncrementalDedup.ingest(b, root + "/fp").count() == 2L,
      "retry must re-admit the whole batch")

    intercept[RuntimeException] {
      IncrementalDedup.ingestNearDup(b, root + "/nd",
        persistOutput = _ => throw new RuntimeException("durable write failed"))
    }
    val retried = IncrementalDedup.ingestNearDup(b, root + "/nd")
    assert(retried.filter(col("near_dup_hit")).isEmpty,
      "retry must not flag the batch against its own keys")
  }

  test("exact copies of sub-shingle short docs still hit via the fingerprint band") {
    import org.apache.spark.sql.functions.col
    val indexDir = Files.createTempDirectory("graft_incshort_").toString + "/index"
    // 2 tokens < shingleN=3: no LSH bands exist for this doc
    IncrementalDedup.ingestNearDup(
      Seq((1L, "hello world")).toDF("doc_id", "text"), indexDir)
    val f = IncrementalDedup.ingestNearDup(
      Seq((10L, "hello world"), (11L, "bye world")).toDF("doc_id", "text"), indexDir)
      .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().toMap
    assert(f == Map(10L -> true, 11L -> false), s"got $f")
  }

  test("returned frame stays valid after its fingerprints land in the index") {
    val indexDir = Files.createTempDirectory("graft_incdedup2_").toString + "/index"
    val accepted = IncrementalDedup.ingest(
      Seq((1L, "xxx"), (2L, "yyy")).toDF("doc_id", "text"), indexDir)
    // consume AFTER the index append: without the checkpoint pin this
    // would re-run the anti-join against an index now containing xxx/yyy
    // and come back empty
    assert(accepted.count() == 2L)
    assert(accepted.count() == 2L) // and stays stable on re-consumption
  }
}
