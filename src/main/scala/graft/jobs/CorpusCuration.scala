package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ext.{Bpe, Dedup, Packing, QualityModel, Sampling, TextOps}

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
    *
    * Stage counts come out of a SINGLE execution of the pipeline, not one
    * per stage (an earlier formulation chained six `.count()`s on an
    * uncached lineage, re-running exact dedup + MinHash + clustering from
    * the corpus scan up for every stage — a ~5× multiplier on the most
    * expensive stages at 100 TB):
    *
    *  - the exact-dedup boundary is persisted — it is consumed twice
    *    regardless (near-dup join input AND MinHash signature input) — and
    *    [[Dedup.exactDedupCounted]] carries the duplicate-group size, so
    *    `input` is `sum(n_copies)` over the deduped cache instead of a
    *    second corpus scan;
    *  - every post-near-dup stage is a *flag column*, not a filter, so one
    *    aggregate over the enriched frame yields all remaining stage
    *    counts in one pass;
    *  - the returned frame is the flag-filtered projection, persisted so
    *    consumers don't re-run the dedup chain (callers should
    *    `.unpersist()` it when done); the intermediate caches are released
    *    before returning.
    *
    * `df.observe()`/CollectMetrics was deliberately rejected for the stage
    * counts: a metrics node below a `persist()` boundary disappears from
    * the executed plan once the cache is substituted in (the cached
    * subtree is replaced by `InMemoryRelation`), so the observation never
    * fires and `Observation.get` blocks forever.
    */
  def curate(
      docs: DataFrame,
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      sampleRates: Map[String, Int] = Map("en" -> 10000),
      defaultSampleBp: Int = 1000
  ): (DataFrame, Stats) = {
    val exact = Dedup.exactDedupCounted(docs).persist(StorageLevel.MEMORY_AND_DISK)
    // action 1: the only scan of the input — materializes the dedup cache
    // and recovers both pre- and post-dedup counts from it
    val exactStats = exact.agg(count(lit(1)).as("n"),
      coalesce(sum(col("n_copies")), lit(0L)).as("input")).head()
    val (afterExact, input) = (exactStats.getLong(0), exactStats.getLong(1))

    val exactDocs = exact.drop("n_copies")
    val near = Dedup.keepCanonical(exactDocs, Dedup.minhashPairs(exactDocs))
    val enriched = near
      .withColumn("lang_guess", TextOps.langId(col("text")))
      .withColumn("__lang_ok", col("lang_guess").isInCollection(allowedLangs))
      .withColumn("quality_ppm", TextOps.qualityScorePpm(col("text")))
      .withColumn("__quality_ok",
        col("__lang_ok") && col("quality_ppm") >= minQualityPpm)
      .withColumn("__samp_ok", col("__quality_ok") && Sampling.stratifiedKeepExpr(
        col("doc_id"), col("lang_guess"), sampleRates, defaultSampleBp))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // action 2: near-dup dedup + all downstream stage counts in one pass
    // (MinHash signatures + clustering execute exactly once, off the
    // exact-dedup cache)
    val stageStats = enriched.agg(
      count(lit(1)).as("after_near"),
      count_if(col("__lang_ok")).as("after_lang"),
      count_if(col("__quality_ok")).as("after_quality"),
      count_if(col("__samp_ok")).as("sampled")).head()

    val sampled = enriched.filter(col("__samp_ok"))
      .withColumn("split", Sampling.splitTag(col("doc_id")))
      .select(col("doc_id"), col("text"), col("lang_guess"),
        col("quality_ppm"), col("split"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // action 3: cheap in-memory pass that pins the result cache so the
    // upstream caches can be released before returning
    sampled.count()
    enriched.unpersist()
    exact.unpersist()

    (sampled, Stats(input, afterExact, stageStats.getLong(0),
      stageStats.getLong(1), stageStats.getLong(2), stageStats.getLong(3)))
  }

  /** Loan-pattern twin of [[curate]]: hands the curated (persisted) frame
    * and stats to `f`, then unpersists in `finally` — callers can't leak
    * the result cache on an exception path or by forgetting the
    * `.unpersist()` the plain API relies on. Use the plain [[curate]]
    * only when the frame must outlive a single scope (e.g. handed to a
    * long-lived consumer that manages the cache itself).
    */
  def curateWith[T](
      docs: DataFrame,
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      sampleRates: Map[String, Int] = Map("en" -> 10000),
      defaultSampleBp: Int = 1000
  )(f: (DataFrame, Stats) => T): T = {
    val (curated, stats) = curate(docs, allowedLangs, minQualityPpm,
      sampleRates, defaultSampleBp)
    try f(curated, stats) finally curated.unpersist()
  }

  /** Benchmark-decontamination policy for [[curateAndPack]]:
    *  - [[Decontaminate.Drop]] (classic): a document sharing ≥
    *    `maxOverlap` distinct n-grams with the eval set is removed
    *    whole — throws away good text when a long doc merely quotes a
    *    benchmark question, but guarantees zero residual overlap;
    *  - [[Decontaminate.Scrub]]: only the contaminated token SPANS
    *    ([[graft.ext.Dedup.contaminatedSpans]]) are excised in place and
    *    the rest of the document survives. `maxOverlap` does not apply —
    *    every overlapping span is removed, so the output is overlap-free
    *    by construction (a stricter guarantee at finer granularity). A
    *    doc that was ENTIRELY benchmark text survives as an empty row;
    *    token counting downstream prices it at ~0, and callers wanting
    *    it gone can filter on `length(text) = 0`.
    */
  sealed trait Decontaminate
  object Decontaminate {
    case object Drop extends Decontaminate
    case object Scrub extends Decontaminate
  }

  /** `scrubbedTokens` is only non-zero under [[Decontaminate.Scrub]]:
    * the total token count excised across all contaminated spans (Σ
    * `n_tokens` over [[graft.ext.Dedup.contaminatedSpans]]).
    */
  case class StatsV2(
      base: Stats,
      afterRepetition: Long,
      afterDecontamination: Long,
      mixtureRows: Long,
      bins: Long,
      scrubbedTokens: Long = 0L)

  /** The full pretraining-prep pipeline, composing every round-3
    * operator on top of [[curate]]'s output:
    *
    *  1. repetition filter (Gopher rule: drop docs whose duplicate-word
    *     fraction exceeds `maxDupWordPpm`),
    *  2. PII scrub (emails/phones redacted in place),
    *  3. benchmark decontamination — [[Decontaminate.Drop]] removes docs
    *     sharing ≥ `maxOverlap` distinct n-grams with the eval set;
    *     [[Decontaminate.Scrub]] excises just the overlapping spans and
    *     keeps the rest (benchmark side broadcast either way),
    *  4. mixture weighting by language (hash-deterministic up/down
    *     sampling with repetition indices),
    *  5. sequence packing into `capacity`-token bins per language.
    *
    * Output: one row per packed copy with (doc_id, copy, lang_guess,
    * split, bin). Per-stage counts come back in [[StatsV2]].
    */
  /** Optional learned/tokenizer stages (defaults preserve the classic
    * pipeline exactly):
    *  - `qualityWeights` — trained [[graft.ext.QualityModel]] weights:
    *    adds the model-based quality gate (score ≥ `minModelScore`)
    *    right after the repetition gate, inside the same counted stage;
    *  - `bpeMerges` — trained [[graft.ext.Bpe]] merge table: packing
    *    bins fill by tokenizer-exact subword counts instead of
    *    whitespace token counts;
    *  - `temperatureBalance` — replace the static `mixtureMilli` map
    *    with α=0.5 weights COMPUTED from the post-decontamination
    *    language distribution ([[graft.ext.Sampling.temperatureResample]]);
    *    the weight pass runs off the already-persisted stage cache, so
    *    it costs no extra corpus scan.
    *
    * Origin-level filtering ([[graft.ext.TextOps.sourceReputation]]) is
    * deliberately a PRE-gate, not a parameter: it needs a source/domain
    * column this pipeline's (doc_id, text) contract doesn't carry —
    * filter on its `kept` verdict before calling curate.
    */
  def curateAndPack(
      docs: DataFrame,
      benchmark: DataFrame,
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      maxDupWordPpm: Long = 500000L,
      maxOverlap: Long = 3L,
      mixtureMilli: Map[String, Int] = Map("en" -> 1000),
      capacity: Long = 2048L,
      qualityWeights: Option[Array[Double]] = None,
      minModelScore: Double = 0.5,
      bpeMerges: Seq[(String, String)] = Nil,
      decontaminate: Decontaminate = Decontaminate.Drop,
      temperatureBalance: Boolean = false
  ): (DataFrame, StatsV2) = {
    val (curated, stats) = curate(docs, allowedLangs, minQualityPpm,
      sampleRates = Map.empty, defaultSampleBp = 10000)

    // Same single-execution discipline as [[curate]]: each stage boundary
    // that is both counted and re-consumed is persisted, counted once, and
    // released as soon as its successor's cache is materialized — no stage
    // ever re-executes for a stats count.
    val (_, dupWordPpm, _, _) = TextOps.repetitionStats(col("text"))
    val heuristicGated = curated
      .withColumn("dup_word_ppm", dupWordPpm)
      .filter(col("dup_word_ppm") <= maxDupWordPpm)
    // optional learned gate, counted inside the same stage (the model
    // score is a flat scalar expression — no extra pass, no shuffle)
    val modelGated = qualityWeights.fold(heuristicGated)(w =>
      heuristicGated.filter(QualityModel.score(col("text"), w) >= minModelScore))
    val lowRepetition = modelGated
      .withColumn("text", TextOps.scrubPii(col("text")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterRepetition = lowRepetition.count() // one pass over curate's cache
    curated.unpersist()

    val (clean, afterDecontamination, scrubbedTokens) = decontaminate match {
      case Decontaminate.Drop =>
        val contaminatedIds = Dedup.contamination(lowRepetition, benchmark)
          .filter(col("n_hits") >= maxOverlap)
          .select(col("id").as("doc_id"))
        val dropped = lowRepetition.join(contaminatedIds, Seq("doc_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        (dropped, dropped.count(), 0L) // shingle overlap computed once
      case Decontaminate.Scrub =>
        // spans feed TWO consumers (the token counter and the scrub join)
        // — persist so the posexplode + broadcast-semi gram pass runs once
        val spans = Dedup.contaminatedSpans(lowRepetition, benchmark)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nScrubbed = spans.agg(coalesce(sum(col("n_tokens")), lit(0L)))
          .head().getLong(0)
        val scrubbed = Dedup.scrubDuplicateSpans(lowRepetition, spans)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val n = scrubbed.count() // materialize before releasing spans
        spans.unpersist()
        (scrubbed, n, nScrubbed)
    }
    lowRepetition.unpersist()

    val mixed =
      if (temperatureBalance)
        // drop weight_milli so both modes emit the same schema
        Sampling.temperatureResample(clean, col("doc_id"), col("lang_guess"))
          .drop("weight_milli")
      else
        Sampling.mixtureSample(clean, col("doc_id"), col("lang_guess"),
          mixtureMilli)
    val countTokens =
      if (bpeMerges.nonEmpty) Bpe.tokenCount(col("text"), bpeMerges)
      else TextOps.tokenCount(col("text"))
    val packed = Packing.assignBins(
      mixed.withColumn("n_tokens", countTokens),
      groupCol = col("lang_guess"),
      orderCol = struct(col("doc_id"), col("copy")),
      tokensCol = col("n_tokens"),
      capacity = capacity)
      .select(col("doc_id"), col("copy"), col("lang_guess"), col("split"), col("bin"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // assignBins is row-preserving, so the mixture row count and the bin
    // count both come off the final (persisted) frame in one action;
    // callers should `.unpersist()` the returned frame when done
    // count_distinct skips rows where either argument is NULL — safe here
    // because curate's language filter guarantees non-null lang_guess and
    // assignBins always emits a bin; if upstream ever admits null strata,
    // this undercounts vs a distinct().count() of the null tuple
    val packedStats = packed.agg(count(lit(1)).as("mixture_rows"),
      count_distinct(col("lang_guess"), col("bin")).as("bins")).head()
    clean.unpersist()

    (packed, StatsV2(stats, afterRepetition, afterDecontamination,
      packedStats.getLong(0), packedStats.getLong(1), scrubbedTokens))
  }

  /** Loan-pattern twin of [[curateAndPack]] — same cache-release contract
    * as [[curateWith]].
    */
  def curateAndPackWith[T](
      docs: DataFrame,
      benchmark: DataFrame,
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      maxDupWordPpm: Long = 500000L,
      maxOverlap: Long = 3L,
      mixtureMilli: Map[String, Int] = Map("en" -> 1000),
      capacity: Long = 2048L,
      qualityWeights: Option[Array[Double]] = None,
      minModelScore: Double = 0.5,
      bpeMerges: Seq[(String, String)] = Nil,
      decontaminate: Decontaminate = Decontaminate.Drop,
      temperatureBalance: Boolean = false
  )(f: (DataFrame, StatsV2) => T): T = {
    val (packed, stats) = curateAndPack(docs, benchmark, allowedLangs,
      minQualityPpm, maxDupWordPpm, maxOverlap, mixtureMilli, capacity,
      qualityWeights, minModelScore, bpeMerges, decontaminate,
      temperatureBalance)
    try f(packed, stats) finally packed.unpersist()
  }

  /** Per-document curation provenance: the FIRST stage among [[curate]]/
    * [[curateAndPack]]'s deterministic per-document gates that rejects
    * each doc — `exact_dup` (not the lowest id of its byte-identical
    * group), `lang`, `quality`, `repetition` — or `kept`. This is the
    * audit table a 100 TB curation run publishes next to its output:
    * "why did my document disappear" answered per id, and per-stage drop
    * counts recoverable as `groupBy(verdict)` instead of re-running the
    * pipeline with counters.
    *
    * Deliberately covers only the stages whose verdict is a function of
    * the document itself (plus the exact-dup group): near-dup canonical
    * choice, benchmark decontamination and sampling depend on the
    * cluster graph / eval set / rates — their verdicts come from
    * [[graft.ext.Dedup.nearDupClusters]] / `contamination` directly.
    *
    * Scale shape: one fingerprint groupBy (the exact-dedup shuffle, done
    * anyway by any dedup pass) + a null-safe join back + flat scalar
    * expressions; verdict precedence mirrors the pipeline's stage order
    * so the audit agrees with what [[curate]] actually does.
    */
  def auditVerdicts(
      docs: DataFrame,
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      maxDupWordPpm: Long = 500000L,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    val keep = docs
      .select(fp.as("__kfp"), col(idCol).as("__kid"))
      .groupBy("__kfp").agg(min(col("__kid")).as("__keep"))
    val (_, dupWordPpm, _, _) = TextOps.repetitionStats(col(textCol))
    val withKeep = docs.select(col(idCol), col(textCol), fp.as("__fp"))
      .join(keep, col("__fp") <=> col("__kfp"))
    withKeep.select(col(idCol),
      when(col(idCol) =!= col("__keep"), "exact_dup")
        .when(!TextOps.langId(col(textCol)).isInCollection(allowedLangs), "lang")
        .when(TextOps.qualityScorePpm(col(textCol)) < minQualityPpm, "quality")
        .when(dupWordPpm > maxDupWordPpm, "repetition")
        .otherwise("kept").as("verdict"))
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
    *
    * Optional stateless gates (both OFF by default, both pure
    * expressions, so the stream's verdicts provably match the same
    * predicate applied in batch — spec-pinned):
    *  - `blocklist` — reject rows whose blocked-token share exceeds
    *    `maxBlockedPpm` ([[TextOps.blocklistOk]]; 0 = any hit rejects);
    *  - `extraGate` — any caller-supplied stateless predicate column,
    *    e.g. [[TextOps.qualityFunnelOk]] for the q86 funnel, or a
    *    conjunction of custom checks. Stateful expressions don't belong
    *    here (they'd need their own watermark/state lifecycle — see
    *    `StatefulOps` for those).
    */
  def curateAtIngest(
      docs: DataFrame,
      tsCol: String = "event_time",
      watermarkDelay: String = "10 minutes",
      allowedLangs: Set[String] = Set("en"),
      minQualityPpm: Long = 500000L,
      maxDupWordPpm: Long = 500000L,
      qualityWeights: Option[Array[Double]] = None,
      minModelScore: Double = 0.5,
      blocklist: Seq[String] = Nil,
      maxBlockedPpm: Long = 0L,
      extraGate: Option[Column] = None
  ): DataFrame = {
    val (_, dupWordPpm, _, _) = TextOps.repetitionStats(col("text"))
    val baseGated = docs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("lang_guess", TextOps.langId(col("text")))
      .filter(col("lang_guess").isInCollection(allowedLangs))
      .withColumn("quality_ppm", TextOps.qualityScorePpm(col("text")))
      .filter(col("quality_ppm") >= minQualityPpm)
      .withColumn("dup_word_ppm", dupWordPpm)
      .filter(col("dup_word_ppm") <= maxDupWordPpm)
    val blockGated =
      if (blocklist.isEmpty) baseGated
      else baseGated.filter(TextOps.blocklistOk(col("text"), blocklist, maxBlockedPpm))
    val gated = extraGate.fold(blockGated)(blockGated.filter)
    // optional learned gate — stateless scalar filter, streaming-safe
    // (mirrors the batch pipeline's model stage in curateAndPack)
    val modelGated = qualityWeights.fold(gated)(w =>
      gated.filter(graft.ext.QualityModel.score(col("text"), w) >= minModelScore))
    modelGated
      .withColumn("text", TextOps.scrubPii(col("text")))
      .withColumn("split", Sampling.splitTag(col("doc_id")))
      .select(col("doc_id"), col("text"), col("lang_guess"),
        col("quality_ppm"), col("split"), col(tsCol))
  }
}
