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

  test("ingest hashes document bytes once: md5 only in the fp-checkpoint plan, once per row") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val indexDir = Files.createTempDirectory("graft_inconep_").toString + "/index"
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      IncrementalDedup.ingest(
        Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("doc_id", "text"), indexDir)
      // second batch exercises the anti-join against a non-empty index
      IncrementalDedup.ingest(
        Seq((4L, "bbb"), (5L, "ccc")).toDF("doc_id", "text"), indexDir)
      // listener events arrive async — wait until the stream quiesces
      var last = -1
      var stable = 0
      var spins = 0
      while (stable < 3 && spins < 50) {
        Thread.sleep(100)
        val n = plans.synchronized(plans.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
        spins += 1
      }
    } finally spark.listenerManager.unregister(listener)
    val all = plans.synchronized(plans.toList)
    val hashing = all.filter(_.contains("md5"))
    assert(hashing.size <= 2,
      s"only the per-batch fp checkpoint may hash text; ${hashing.size} plans contain md5")
    // and within that plan md5 appears ONCE (the old formulation hashed the
    // same bytes in the window partition key AND the fp projection)
    hashing.foreach { p =>
      val occurrences = "md5\\(".r.findAllIn(p).size
      assert(occurrences <= 1, s"plan evaluates md5 $occurrences times:\n${p.take(900)}")
    }
  }

  test("bloom-pre-filtered ingest admits exactly the plain path's documents") {
    val root = Files.createTempDirectory("graft_incbloom_").toString
    val batches = Seq(
      Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc")),
      Seq((10L, "bbb"), (11L, "ddd"), (12L, "ddd"), (13L, "eee")),
      Seq((20L, "aaa"), (21L, "ddd"), (22L, "fff")))
    for (batch <- batches) {
      val df = batch.toDF("doc_id", "text")
      val plain = IncrementalDedup.ingest(df, root + "/plain")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val bloomed = IncrementalDedup.ingest(df, root + "/bloom", bloomFpp = Some(0.01))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(bloomed == plain, s"bloom path diverged on batch $batch")
    }
    assert(IncrementalDedup.indexSize(spark, root + "/plain") ==
      IncrementalDedup.indexSize(spark, root + "/bloom"))
  }

  test("bloom-pre-filtered near-dup ingest flags exactly the plain path's documents") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_incndbloom_").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val batches = Seq(
      Seq((1L, base), (2L, far), (3L, "hi there")), // incl. a short doc (fp band)
      Seq((10L, near), (11L, far), (12L, "hi there"), (13L, "fresh text entirely new")),
      Seq((20L, "fresh text entirely novel"), (21L, base)))
    for (batch <- batches) {
      val df = batch.toDF("doc_id", "text")
      val plain = IncrementalDedup.ingestNearDup(df, root + "/plain")
        .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().sorted.toSeq
      val bloomed = IncrementalDedup.ingestNearDup(df, root + "/bloom",
          bloomFpp = Some(0.01))
        .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().sorted.toSeq
      assert(bloomed == plain, s"bloom path diverged on batch $batch")
      assert(plain.exists(_._2) || batch == batches.head,
        "fixture must exercise real hits, not vacuous equality")
    }
  }

  test("the batch bloom prunes the overwhelming bulk of a low-hit-rate index") {
    import org.apache.spark.sql.functions.md5
    // 5000 indexed fingerprints, a 20-doc batch with 10 true hits: index
    // rows surviving the batch bloom ≈ hits + fpp·|index|, not |index|
    val indexFps = (0 until 5000).map(i => s"indexed doc $i")
      .toDF("text").select(md5($"text").as("fp")).as[String].collect()
    val batch = ((0 until 10).map(i => s"indexed doc $i") ++
      (0 until 10).map(i => s"fresh doc $i")).toDF("text")
      .select(md5($"text").as("fp"))
    val bloom = batch.stat.bloomFilter("fp", 20, 0.03)
    val survivors = indexFps.count(bloom.mightContainString)
    assert(survivors >= 10, "bloom filters must never drop a true hit")
    assert(survivors < 600, s"bloom pruned too little: $survivors of 5000 survive")
  }

  test("compactIndex shrinks a blind-append band-key index; decisions unchanged") {
    import org.apache.spark.sql.functions.col
    val indexDir = Files.createTempDirectory("graft_inccompact_").toString + "/index"
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    // two batches carrying the same document → every band key appended twice
    IncrementalDedup.ingestNearDup(Seq((1L, base)).toDF("doc_id", "text"), indexDir)
    IncrementalDedup.ingestNearDup(Seq((2L, base)).toDF("doc_id", "text"), indexDir)
    val rowsBefore = spark.read.parquet(indexDir).count()
    val distinctKeys = spark.read.parquet(indexDir).distinct().count()
    assert(rowsBefore > distinctKeys, "fixture must actually bloat the index")
    IncrementalDedup.compactIndex(spark, indexDir)
    assert(spark.read.parquet(indexDir).count() == distinctKeys)
    // post-compaction decisions identical: near-dup flags, novel doc doesn't
    val f = IncrementalDedup.ingestNearDup(
      Seq((10L, near), (11L, far)).toDF("doc_id", "text"), indexDir)
      .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().toMap
    assert(f == Map(10L -> true, 11L -> false), s"got $f")

    // fp index: simulate a crash-replayed append, compact, re-ingest
    val fpDir = Files.createTempDirectory("graft_inccompfp_").toString + "/index"
    IncrementalDedup.ingest(Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text"), fpDir)
    val dup = spark.read.parquet(fpDir).collect().map(_.getString(0)).toSeq
      .toDF("fp")
    dup.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(fpDir)
    assert(spark.read.parquet(fpDir).count() == 4L)
    IncrementalDedup.compactIndex(spark, fpDir)
    assert(spark.read.parquet(fpDir).count() == 2L)
    val a = IncrementalDedup.ingest(
      Seq((10L, "aaa"), (11L, "new one")).toDF("doc_id", "text"), fpDir)
      .select("doc_id").as[Long].collect().toList
    assert(a == List(11L), "compacted index must still reject known content")
  }

  test("auto-compaction fires on the bloat ratio mid-ingest and preserves decisions") {
    import org.apache.spark.sql.functions.col
    val indexDir = Files.createTempDirectory("graft_incauto_").toString + "/index"
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    // identical content batch over batch: the blind band-key append stacks
    // every key once per batch, so the bloat ratio equals the batch count
    // (tiny key sets make approx_count_distinct exact — no boundary flake)
    for (i <- 0L until 3L)
      IncrementalDedup.ingestNearDup(
        Seq((i, base)).toDF("doc_id", "text"), indexDir, autoCompact = true)
    val distinctKeys = spark.read.parquet(indexDir).distinct().count()
    assert(spark.read.parquet(indexDir).count() == 3 * distinctKeys,
      "ratio 3 is under the default trigger of 4: bloated but untriggered")
    IncrementalDedup.ingestNearDup(
      Seq((3L, base)).toDF("doc_id", "text"), indexDir, autoCompact = true)
    assert(spark.read.parquet(indexDir).count() == distinctKeys,
      "4th ingest reaches ratio 4 and compacts to the distinct key set")
    // decisions preserved across the automatic rewrite
    val f = IncrementalDedup.ingestNearDup(
      Seq((10L, near), (11L, far)).toDF("doc_id", "text"), indexDir)
      .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().toMap
    assert(f == Map(10L -> true, 11L -> false), s"got $f")
    // a manual probe with a tight file cap also fires (the exact-fp path's
    // trigger, where rows never duplicate but files accrue per batch)
    val fpDir = Files.createTempDirectory("graft_incautofp_").toString + "/index"
    IncrementalDedup.ingest(Seq((1L, "aaa")).toDF("doc_id", "text"), fpDir)
    IncrementalDedup.ingest(Seq((2L, "bbb")).toDF("doc_id", "text"), fpDir)
    val filesBefore = new java.io.File(fpDir).listFiles()
      .count(f2 => f2.isFile && f2.getName.endsWith(".parquet"))
    assert(!IncrementalDedup.maybeCompactIndex(spark, fpDir, maxFiles = filesBefore),
      "at the cap: no compaction")
    assert(IncrementalDedup.maybeCompactIndex(spark, fpDir, maxFiles = filesBefore - 1),
      "over the cap: compaction runs")
    assert(spark.read.parquet(fpDir).count() == 2L, "rows survive the rewrite")
  }

  test("a crashed compaction swap heals on the next read, whichever side it died on") {
    val root = Files.createTempDirectory("graft_increcover_").toString
    val indexDir = root + "/index"
    IncrementalDedup.ingest(
      Seq((1L, "aaa"), (2L, "bbb"), (3L, "ccc")).toDF("doc_id", "text"), indexDir)
    // crash window 1: live moved aside, replacement never moved in
    val live = new java.io.File(indexDir)
    val old = new java.io.File(indexDir + ".old")
    assert(live.renameTo(old))
    assert(IncrementalDedup.indexSize(spark, indexDir) == 3L,
      "readIndex must restore the .old backup when the live dir is missing")
    assert(!old.exists())
    // crash window 2: swap completed but the backup was never dropped
    val staleOld = new java.io.File(indexDir + ".old")
    assert(staleOld.mkdirs())
    java.nio.file.Files.write(staleOld.toPath.resolve("junk"), Array[Byte](1, 2, 3))
    assert(IncrementalDedup.indexSize(spark, indexDir) == 3L)
    assert(!staleOld.exists(), "a redundant .old backup must be dropped")
  }

  test("in-batch near-dup pairs flag the larger id when one batch holds both copies") {
    import org.apache.spark.sql.functions.col
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val indexDir = Files.createTempDirectory("graft_incinb_").toString + "/index"
    val f = IncrementalDedup.ingestNearDup(
      Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text"), indexDir)
      .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().toMap
    assert(f == Map(1L -> false, 2L -> true, 3L -> false),
      s"smaller id keeps, larger id flags (cross-batch convention): got $f")

    // flagInBatch=false preserves the old cross-batch-only semantics
    val offDir = Files.createTempDirectory("graft_incinboff_").toString + "/index"
    val g = IncrementalDedup.ingestNearDup(
      Seq((1L, base), (2L, near)).toDF("doc_id", "text"), offDir, flagInBatch = false)
    assert(g.filter(col("near_dup_hit")).isEmpty)

    // sub-shingle short docs: exact in-batch copies flag via the fp band
    val shortDir = Files.createTempDirectory("graft_incinbshort_").toString + "/index"
    val h = IncrementalDedup.ingestNearDup(
      Seq((1L, "hello world"), (2L, "hello world"), (3L, "bye world"))
        .toDF("doc_id", "text"), shortDir)
      .select("doc_id", "near_dup_hit").as[(Long, Boolean)].collect().toMap
    assert(h == Map(1L -> false, 2L -> true, 3L -> false), s"got $h")
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
