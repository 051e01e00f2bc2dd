package graft.jobs

import graft.SparkTestBase
import graft.core.Tables

class CorpusCurationSpec extends SparkTestBase {

  /** Parquet scans actually present in an executed plan, unwrapping AQE
    * wrappers and runtime query stages. Deliberately does NOT descend into
    * `InMemoryTableScanExec` (a leaf): a scan living only inside a cached
    * plan executes at most once — at cache materialization — which is
    * exactly the property the single-scan test below pins.
    */
  private def parquetScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => parquetScans(a.executedPlan)
      case q: QueryStageExec        => parquetScans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(parquetScans)
    }
  }

  test("curate computes stage stats in a single pipeline execution (corpus scanned at most once)") {
    import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
    import org.apache.spark.sql.util.QueryExecutionListener
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        seen.add(qe.executedPlan)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        seen.add(qe.executedPlan)
    }
    spark.listenerManager.register(listener)
    val (stats, nRows) = try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      // probe action: ONE deliberate uncached scan, proving the collector
      // below actually sees parquet scans (a vacuous collector would pass
      // any threshold)
      docs.count()
      val (curated, st) = CorpusCuration.curate(docs,
        allowedLangs = Set("en", "und"), minQualityPpm = 300000L)
      val n = curated.count()
      curated.unpersist()
      // listener delivery is async — wait until the execution stream drains.
      // Timing-based (100ms polls, 3 stable reads, 10s deadline): if this
      // ever flakes under load, raise the deadline / require more stable
      // reads rather than asserting on a partially drained queue.
      var size = -1
      var stable = 0
      val deadline = System.nanoTime + 10000000000L
      while (stable < 3 && System.nanoTime < deadline) {
        if (seen.size == size) stable += 1 else { stable = 0; size = seen.size }
        Thread.sleep(100)
      }
      (st, n)
    } finally spark.listenerManager.unregister(listener)

    val docScans = seen.asScala.toList.flatMap(parquetScans)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("documents")))
    // exactly the probe's scan: curate() itself must add zero uncached
    // scans of the corpus (its only read is the cache-materializing one,
    // which lives inside InMemoryRelation and is executed at most once)
    assert(docScans.size == 1,
      s"documents.parquet appeared uncached in ${docScans.size} executed plans " +
        "(expected only the probe count) — per-stage stats are re-executing the pipeline")

    // the single-pass stats must equal the naively recomputed stage counts
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(stats.input == docs.count())
    val exact = graft.ext.Dedup.exactDedup(docs)
    assert(stats.afterExactDedup == exact.count())
    val near = graft.ext.Dedup.keepCanonical(exact, graft.ext.Dedup.minhashPairs(exact))
    assert(stats.afterNearDedup == near.count())
    val withLang = near
      .withColumn("lang_guess", graft.ext.TextOps.langId(col("text")))
      .filter(col("lang_guess").isInCollection(Set("en", "und")))
    assert(stats.afterLangFilter == withLang.count())
    val withQuality = withLang
      .withColumn("quality_ppm", graft.ext.TextOps.qualityScorePpm(col("text")))
      .filter(col("quality_ppm") >= 300000L)
    assert(stats.afterQuality == withQuality.count())
    val sampled = graft.ext.Sampling.stratifiedHashSample(withQuality,
      col("doc_id"), col("lang_guess"), Map("en" -> 10000), 1000)
    assert(stats.sampled == sampled.count())
    assert(nRows == stats.sampled)
  }

  test("curation pipeline composes dedup -> lang -> quality -> sample -> split on the fixtures") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (curated, stats) = CorpusCuration.curate(docs,
      allowedLangs = Set("en", "und"), minQualityPpm = 300000L)

    assert(stats.input > 0)
    assert(stats.afterExactDedup <= stats.input)
    assert(stats.afterNearDedup <= stats.afterExactDedup)
    assert(stats.afterLangFilter <= stats.afterNearDedup)
    assert(stats.afterQuality <= stats.afterLangFilter)
    assert(stats.sampled <= stats.afterQuality)
    assert(stats.sampled > 0, s"curation must keep some docs: $stats")

    val rows = curated.collect()
    curated.unpersist()
    assert(rows.forall(_.getAs[Long]("quality_ppm") >= 300000L))
    assert(rows.forall(r => Set("train", "valid", "test").contains(r.getAs[String]("split"))))
    assert(rows.forall(r => Set("en", "und").contains(r.getAs[String]("lang_guess"))))
    // determinism: same input -> identical output set
    val (again, _) = CorpusCuration.curate(docs,
      allowedLangs = Set("en", "und"), minQualityPpm = 300000L)
    val againIds = again.collect().map(_.getAs[Long]("doc_id")).sorted.toList
    again.unpersist()
    assert(againIds == rows.map(_.getAs[Long]("doc_id")).sorted.toList)
  }

  test("curateWith releases the result cache on normal AND exceptional exit") {
    import org.apache.spark.storage.StorageLevel
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")

    var loaned: org.apache.spark.sql.DataFrame = null
    val n = CorpusCuration.curateWith(docs,
      allowedLangs = Set("en", "und"), minQualityPpm = 300000L) { (df, stats) =>
      loaned = df
      assert(df.storageLevel != StorageLevel.NONE, "frame must be persisted inside the loan")
      assert(stats.sampled > 0)
      df.count()
    }
    assert(n == loaned.count(), "result usable inside the loan")
    assert(loaned.storageLevel == StorageLevel.NONE,
      "cache must be released when the loan returns")

    intercept[RuntimeException] {
      CorpusCuration.curateWith(docs,
        allowedLangs = Set("en", "und"), minQualityPpm = 300000L) { (df, _) =>
        loaned = df
        throw new RuntimeException("consumer failed")
      }
    }
    assert(loaned.storageLevel == StorageLevel.NONE,
      "cache must be released on the exception path too")
  }

  test("curateAndPack adds repetition/PII/decontamination/mixture/packing stages") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val benchmark = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val (packed, stats) = CorpusCuration.curateAndPack(corpus, benchmark,
      allowedLangs = Set("en", "und"), minQualityPpm = 300000L,
      mixtureMilli = Map("en" -> 2000), capacity = 512L)

    assert(stats.afterRepetition <= stats.base.sampled)
    assert(stats.afterDecontamination <= stats.afterRepetition)
    // en upsampled 2x: more output rows than surviving docs (unless none)
    assert(stats.mixtureRows >= stats.afterDecontamination)
    assert(stats.bins > 0)

    val rows = packed.collect()
    packed.unpersist()
    assert(rows.nonEmpty)
    // packing is per language: bins numbered from 0 within each group
    val langs = rows.map(_.getAs[String]("lang_guess")).distinct
    langs.foreach { l =>
      val bins = rows.filter(_.getAs[String]("lang_guess") == l)
        .map(_.getAs[Long]("bin"))
      assert(bins.min == 0L)
    }
    // upsampled docs appear with distinct copy indices
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).distinct.length
      == rows.length)
  }

  test("curateAndPack optional stages: model quality gate and BPE-exact packing") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val benchmark = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    def run(qw: Option[Array[Double]], merges: Seq[(String, String)]) =
      CorpusCuration.curateAndPack(corpus, benchmark,
        allowedLangs = Set("en", "und"), minQualityPpm = 300000L,
        mixtureMilli = Map("en" -> 2000), capacity = 512L,
        qualityWeights = qw, minModelScore = 0.5, bpeMerges = merges)

    val (basePacked, base) = run(None, Nil)
    val baseRows = basePacked.collect(); basePacked.unpersist()

    // an adversarial model that labels everything junk must gate docs out
    val rejectAll = Array(-10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val (gatedPacked, gated) = run(Some(rejectAll), Nil)
    gatedPacked.unpersist()
    assert(gated.afterRepetition == 0L,
      s"score≈0 model must reject every doc, kept ${gated.afterRepetition}")

    // a permissive model keeps the pipeline identical to the baseline
    val acceptAll = Array(10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val (samePacked, same) = run(Some(acceptAll), Nil)
    samePacked.unpersist()
    assert(same == base)

    // BPE counts are >= whitespace counts, so bins can only multiply
    val merges = graft.ext.Bpe.trainMerges(corpus, numMerges = 30)
    val (bpePacked, bpe) = run(None, merges)
    val bpeRows = bpePacked.collect(); bpePacked.unpersist()
    assert(bpe.base == base.base && bpe.mixtureRows == base.mixtureRows,
      "upstream stages must not depend on the packing tokenizer")
    assert(bpe.bins >= base.bins, s"bpe bins ${bpe.bins} < baseline ${base.bins}")
    assert(bpeRows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).toSet ==
      baseRows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).toSet,
      "packing is row-preserving under either tokenizer")
  }

  test("curateAndPack temperatureBalance flattens the language mix from corpus counts") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val benchmark = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    def run(balance: Boolean) = CorpusCuration.curateAndPackWith(corpus,
      benchmark, allowedLangs = Set("en", "und", "es", "de", "fr", "zh"),
      minQualityPpm = 300000L, mixtureMilli = Map.empty,
      capacity = 512L, temperatureBalance = balance) { (packed, stats) =>
      (packed.groupBy("lang_guess").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap, stats)
    }
    val (staticMix, staticStats) = run(false) // all-default weights: 1 copy per doc
    val (balanced, balancedStats) = run(true)
    assert(staticStats.afterDecontamination == balancedStats.afterDecontamination,
      "balancing must not change any upstream stage")
    // total size approximately preserved under temperature resampling
    val (ns, nb) = (staticMix.values.sum, balanced.values.sum)
    assert(nb > (ns * 0.7).toLong && nb < (ns * 1.3).toLong, s"static $ns vs balanced $nb")
    // the dominant language's share must strictly shrink toward the mean
    val top = staticMix.maxBy(_._2)._1
    val staticShare = staticMix(top).toDouble / ns
    val balShare = balanced.getOrElse(top, 0L).toDouble / nb
    assert(balShare < staticShare,
      s"α=0.5 must flatten the head: $top $staticShare -> $balShare")
    // both modes emit the identical packed schema
    assert(balancedStats.bins > 0)
  }

  test("curateAndPack Scrub mode keeps a partially-contaminated doc with its spans excised") {
    import spark.implicits._
    val prefix = "the quick brown fox jumps over a lazy dog"          // 9 tokens
    val phrase = "what is the capital of france and why exactly"      // 9 tokens
    val suffix = "while many other animals watch from tall green trees " +
      "near a quiet river bank and the sun sets slowly behind distant hills"
    val benchmark = Seq((100L, phrase)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"$prefix $phrase $suffix"), // quotes the benchmark mid-document
      (2L, "completely different prose about mountains rivers valleys " +
        "forests deserts oceans islands plains canyons plateaus glaciers " +
        "meadows swamps tundras savannas cliffs dunes caves springs lagoons")
    ).toDF("doc_id", "text")
    def run(mode: CorpusCuration.Decontaminate) =
      CorpusCuration.curateAndPack(corpus, benchmark,
        allowedLangs = Set("en", "und"), minQualityPpm = 300000L,
        decontaminate = mode)

    // doc 1 shares five distinct 5-grams (>= maxOverlap 3) -> Drop removes it whole
    val (droppedPacked, dropped) = run(CorpusCuration.Decontaminate.Drop)
    val droppedIds = droppedPacked.select("doc_id").as[Long].collect().toSet
    droppedPacked.unpersist()
    assert(dropped.afterRepetition == 2L)
    assert(dropped.afterDecontamination == 1L && droppedIds == Set(2L),
      "Drop mode must remove the quoting doc whole")
    assert(dropped.scrubbedTokens == 0L, "Drop mode never scrubs spans")

    // Scrub keeps BOTH docs; exactly the phrase's 9-token span is excised:
    // the phrase occupies token positions 9..17, its internal 5-grams hit
    // at start positions 9..13 -> one merged island [9, 18)
    val (scrubPacked, scrubbed) = run(CorpusCuration.Decontaminate.Scrub)
    val scrubIds = scrubPacked.select("doc_id").as[Long].collect().toSet
    scrubPacked.unpersist()
    assert(scrubbed.afterDecontamination == 2L && scrubIds == Set(1L, 2L),
      "Scrub mode must keep the partially-contaminated doc")
    assert(scrubbed.scrubbedTokens == 9L,
      s"exactly the quoted passage's tokens are excised: $scrubbed")
    // stages upstream and downstream of the policy reconcile across modes
    assert(scrubbed.base == dropped.base && scrubbed.afterRepetition == dropped.afterRepetition)
    assert(scrubbed.mixtureRows == scrubbed.afterDecontamination,
      "1000-milli mixture emits one copy per surviving doc")

    // the scrub itself is the independently-tested operator: the kept text
    // equals prefix + suffix with the quoted passage gone (the corpus has
    // no PII, so the pipeline's pre-scrub text is the raw fixture text)
    val scrubbedText = graft.ext.Dedup.scrubContamination(corpus, benchmark)
      .filter($"doc_id" === 1L).select("text").as[String].head()
    assert(scrubbedText == s"$prefix $suffix")
  }

  test("curateAtIngest: streaming stages mirror the batch pipeline on a drained stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // varied wording: the repetition gate (correctly) drops phrase-repeat docs
    val good = "the quick brown fox jumps over a lazy dog while many other animals " +
      "watch from tall green trees near a quiet river bank and the sun sets slowly " +
      "behind distant hills casting long soft shadows across wide open fields"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = CorpusCuration.curateAtIngest(stream)
      .writeStream.format("memory").queryName("ingest_out").outputMode("append").start()
    try {
      mem.addData(Seq(
        (1L, good, t("2024-01-01 00:00:00")),
        (2L, good, t("2024-01-01 00:00:01")),            // exact dup of 1 -> dropped
        (3L, "el la los de es " * 10, t("2024-01-01 00:00:02")), // non-en -> dropped
        (4L, "word " * 60, t("2024-01-01 00:00:03")),    // all-repeat -> repetition gate
        (5L, good + " mail me: a@b.co now", t("2024-01-01 00:00:04")))) // PII scrubbed
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("ingest_out")
      .select("doc_id", "text", "lang_guess", "quality_ppm", "split")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 5L), s"survivors: ${out.keySet}")
    assert(out(5L).getString(1).contains("<EMAIL>"))
    assert(out(1L).getString(2) == "en")
    assert(Set("train", "valid", "test").contains(out(1L).getString(4)))
  }

  test("auditVerdicts reports the first failing stage per doc, in pipeline order") {
    import spark.implicits._
    val good = "the quick brown fox jumps over a lazy dog while many other animals " +
      "watch from tall green trees near a quiet river bank and the sun sets slowly " +
      "behind distant hills casting long soft shadows across wide open fields"
    val docs = Seq(
      (1L, good),                          // kept
      (2L, good),                          // byte-copy of 1 -> exact_dup
      (3L, "el la los de es " * 10),       // Spanish -> lang
      (4L, "the tiny"),                    // en but 2 tokens -> quality
      (5L, good + (" word" * 60)),         // heavy word repeats -> repetition
      // precedence: doc 6 fails lang AND quality AND repetition, but the
      // FIRST pipeline stage to reject it is the exact-dup group with 3
      (6L, "el la los de es " * 10)
    ).toDF("doc_id", "text")
    val got = CorpusCuration.auditVerdicts(docs,
        allowedLangs = Set("en"), minQualityPpm = 500000L, maxDupWordPpm = 300000L)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "kept", 2L -> "exact_dup", 3L -> "lang",
      4L -> "quality", 5L -> "repetition", 6L -> "exact_dup"), s"got $got")
    // stage counts without re-running the pipeline
    val counts = CorpusCuration.auditVerdicts(docs,
        allowedLangs = Set("en"), minQualityPpm = 500000L, maxDupWordPpm = 300000L)
      .groupBy("verdict").count().as[(String, Long)].collect().toMap
    assert(counts("exact_dup") == 2L && counts("kept") == 1L)
  }

  test("curateAtIngest blocklist + funnel gates match the batch predicates row for row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.ext.TextOps
    val good = "the quick brown fox jumps over a lazy dog while many other animals " +
      "watch from tall green trees near a quiet river bank and the sun sets slowly " +
      "behind distant hills casting long soft shadows across wide open fields"
    val fixtures = Seq(
      (1L, good),                   // passes every gate
      (2L, good + " frak attack"),  // one blocklisted token -> blocklist gate
      // high quality score (distinct stopword-y words) but only 18 tokens
      // and < 200 chars: passes the BASE gates, fails the q86 funnel
      (3L, "we need just twenty distinct common words so the gate of a " +
        "stream can judge token range here"))
    val blocklist = Seq("frak")

    // batch verdicts from the SAME stateless predicates
    val batch = fixtures.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.blocklistOk(col("text"), blocklist).as("block_ok"),
        TextOps.qualityFunnelOk(col("text")).as("funnel_ok"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(batch == Map(1L -> ((true, true)), 2L -> ((false, true)), 3L -> ((true, false))),
      s"fixture docs must isolate one gate each: $batch")

    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = CorpusCuration.curateAtIngest(stream,
        blocklist = blocklist,
        extraGate = Some(TextOps.qualityFunnelOk(col("text"))))
      .writeStream.format("memory").queryName("ingest_gates").outputMode("append").start()
    try {
      mem.addData(fixtures.zipWithIndex.map { case ((id, text), i) =>
        (id, text, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$i")) })
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("ingest_gates").select("doc_id").as[Long].collect().toSet
    val expected = batch.collect { case (id, (b, f)) if b && f => id }.toSet
    assert(streamed == expected && expected == Set(1L),
      s"stream survivors $streamed must equal batch-predicate survivors $expected")
  }

  test("curateAtIngest applies the optional model gate statelessly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val good = "the quick brown fox jumps over a lazy dog while many other animals " +
      "watch from tall green trees near a quiet river bank as the sun sets"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val rejectAll = Array(-10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val query = CorpusCuration.curateAtIngest(stream, qualityWeights = Some(rejectAll))
      .writeStream.format("memory").queryName("ingest_gated").outputMode("append").start()
    try {
      mem.addData(Seq((1L, good, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
      query.processAllAvailable()
    } finally query.stop()
    assert(spark.table("ingest_gated").isEmpty,
      "a score~0 model must gate every doc out of the stream")
  }
}
