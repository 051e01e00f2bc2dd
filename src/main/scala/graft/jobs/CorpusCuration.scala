package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, TextOps}

/** End-to-end corpus curation — the composed training-data pipeline the
  * extension operators exist for:
  *
  *   exact dedup → near-dup canonical keep (MinHash/LSH + connected
  *   components) → language filter → quality threshold → stratified
  *   sample → train/valid/test split tags.
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
}
