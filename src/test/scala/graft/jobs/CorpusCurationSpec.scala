package graft.jobs

import graft.SparkTestBase
import graft.core.Tables

class CorpusCurationSpec extends SparkTestBase {

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
    assert(rows.forall(_.getAs[Long]("quality_ppm") >= 300000L))
    assert(rows.forall(r => Set("train", "valid", "test").contains(r.getAs[String]("split"))))
    assert(rows.forall(r => Set("en", "und").contains(r.getAs[String]("lang_guess"))))
    // determinism: same input -> identical output set
    val (again, _) = CorpusCuration.curate(docs,
      allowedLangs = Set("en", "und"), minQualityPpm = 300000L)
    assert(again.collect().map(_.getAs[Long]("doc_id")).sorted.toList ==
      rows.map(_.getAs[Long]("doc_id")).sorted.toList)
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
}
