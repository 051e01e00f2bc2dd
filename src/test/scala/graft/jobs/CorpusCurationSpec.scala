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
}
