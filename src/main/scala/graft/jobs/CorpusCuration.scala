package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Packing, Sampling, TextOps}

/** End-to-end corpus curation — the composed training-data pipeline the
  * extension operators exist for:
  *
  *   exact dedup → near-dup canonical keep (MinHash/LSH + connected
  *   components) → language filter → quality + repetition thresholds →
  *   PII scrub → benchmark decontamination → stratified sample →
  *   train/valid/test split tags → mixture weighting → sequence packing.
  *
  * Every stage is one of the independently oracle-verified operators;
  * the composition is linear scans + the dedup shuffles, so the whole
  * job scales like its worst stage (MinHash: one shuffle on (band, key)).
  */
object CorpusCuration {

  case class Stats(
      input: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      afterLangFilter: Long,
      afterQuality: Long,
      sampled: Long)

  /** Curate a document corpus. Returns the curated DataFrame
    * (doc_id, text, lang_guess, quality_ppm, split) and per-stage counts.
    */
  def curate(
      docs: DataFrame,
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      sampleRates: Map[String, Int] = Map("en" -> 10000),
      defaultSampleBp: Int = 1000
  ): (DataFrame, Stats) = {
    val input = docs.count()

    val exact = Dedup.exactDedup(docs)
    val afterExact = exact.count()

    val near = Dedup.keepCanonical(exact, Dedup.minhashPairs(exact))
    val afterNear = near.count()

    val withLang = near.withColumn("lang_guess", TextOps.langId(col("text")))
      .filter(col("lang_guess").isInCollection(allowedLangs))
    val afterLang = withLang.count()

    val withQuality = withLang
      .withColumn("quality_ppm", TextOps.qualityScorePpm(col("text")))
      .filter(col("quality_ppm") >= minQualityPpm)
    val afterQuality = withQuality.count()

    val sampled = Sampling.stratifiedHashSample(withQuality,
        col("doc_id"), col("lang_guess"), sampleRates, defaultSampleBp)
      .withColumn("split", Sampling.splitTag(col("doc_id")))
      .select(col("doc_id"), col("text"), col("lang_guess"),
        col("quality_ppm"), col("split"))
    val nSampled = sampled.count()

    (sampled, Stats(input, afterExact, afterNear, afterLang, afterQuality, nSampled))
  }

  case class StatsV2(
      base: Stats,
      afterRepetition: Long,
      afterDecontamination: Long,
      mixtureRows: Long,
      bins: Long)

  /** The full pretraining-prep pipeline, composing every round-3
    * operator on top of [[curate]]'s output:
    *
    *  1. repetition filter (Gopher rule: drop docs whose duplicate-word
    *     fraction exceeds `maxDupWordPpm`),
    *  2. PII scrub (emails/phones redacted in place),
    *  3. benchmark decontamination (drop docs sharing ≥ `maxOverlap`
    *     distinct n-grams with the eval set — benchmark side broadcast),
    *  4. mixture weighting by language (hash-deterministic up/down
    *     sampling with repetition indices),
    *  5. sequence packing into `capacity`-token bins per language.
    *
    * Output: one row per packed copy with (doc_id, copy, lang_guess,
    * split, bin). Per-stage counts come back in [[StatsV2]].
    */
  def curateAndPack(
      docs: DataFrame,
      benchmark: DataFrame,
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      maxDupWordPpm: Long = 500000L,
      maxOverlap: Long = 3L,
      mixtureMilli: Map[String, Int] = Map("en" -> 1000),
      capacity: Long = 2048L
  ): (DataFrame, StatsV2) = {
    val (curated, stats) = curate(docs, allowedLangs, minQualityPpm,
      sampleRates = Map.empty, defaultSampleBp = 10000)

    val (_, dupWordPpm, _, _) = TextOps.repetitionStats(col("text"))
    val lowRepetition = curated
      .withColumn("dup_word_ppm", dupWordPpm)
      .filter(col("dup_word_ppm") <= maxDupWordPpm)
      .withColumn("text", TextOps.scrubPii(col("text")))
    val afterRepetition = lowRepetition.count()

    val contaminatedIds = Dedup.contamination(lowRepetition, benchmark)
      .filter(col("n_hits") >= maxOverlap)
      .select(col("id").as("doc_id"))
    val clean = lowRepetition.join(contaminatedIds, Seq("doc_id"), "left_anti")
    val afterDecontamination = clean.count()

    val mixed = Sampling.mixtureSample(clean, col("doc_id"), col("lang_guess"),
      mixtureMilli)
    val mixtureRows = mixed.count()

    val packed = Packing.assignBins(
      mixed.withColumn("n_tokens", TextOps.tokenCount(col("text"))),
      groupCol = col("lang_guess"),
      orderCol = struct(col("doc_id"), col("copy")),
      tokensCol = col("n_tokens"),
      capacity = capacity)
      .select(col("doc_id"), col("copy"), col("lang_guess"), col("split"), col("bin"))
    val bins = packed.select(col("lang_guess"), col("bin")).distinct().count()

    (packed, StatsV2(stats, afterRepetition, afterDecontamination, mixtureRows, bins))
  }

  /** Curation AT INGEST — the streaming twin of [[curate]]'s per-document
    * stages over an unbounded document stream:
    *
    *  - exact dedup within the watermark horizon (128-bit content
    *    fingerprint + `dropDuplicatesWithinWatermark` — the one stateful
    *    op, state evicted as the watermark advances);
    *  - language / quality / repetition gates and PII scrubbing as
    *    inline projections (stateless, embarrassingly parallel);
    *  - deterministic train/valid/test split tags.
    *
    * Near-dup detection runs as the COMPANION query
    * `streaming.StatefulOps.nearDupHits` on the same stream: its
    * `BandHit` output is an id blocklist the consumer anti-joins per
    * micro-batch (`foreachBatch`) or downstream — chaining a second
    * stateful operator inside this query would couple the two state
    * lifetimes for no gain. Output columns match [[curate]]:
    * (doc_id, text, lang_guess, quality_ppm, split) + event_time.
    */
  def curateAtIngest(
      docs: DataFrame,
      tsCol: String = "event_time",
      watermarkDelay: String = "10 minutes",
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      maxDupWordPpm: Long = 500000L
  ): DataFrame = {
    val (_, dupWordPpm, _, _) = TextOps.repetitionStats(col("text"))
    docs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("lang_guess", TextOps.langId(col("text")))
      .filter(col("lang_guess").isInCollection(allowedLangs))
      .withColumn("quality_ppm", TextOps.qualityScorePpm(col("text")))
      .filter(col("quality_ppm") >= minQualityPpm)
      .withColumn("dup_word_ppm", dupWordPpm)
      .filter(col("dup_word_ppm") <= maxDupWordPpm)
      .withColumn("text", TextOps.scrubPii(col("text")))
      .withColumn("split", Sampling.splitTag(col("doc_id")))
      .select(col("doc_id"), col("text"), col("lang_guess"),
        col("quality_ppm"), col("split"), col(tsCol))
  }
}
