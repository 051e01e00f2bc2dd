package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.ext.TextOps

class CorpusReportSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def requireFixtures(): Unit =
    assume(new java.io.File(dir).isDirectory, s"fixture dir $dir not present")

  test("report marginals are consistent: each dimension sums to the grand total") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val rows = CorpusReport.report(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val total = rows.filter(_._1 == "total")
    assert(total.length == 1 && total.head._2 == null)
    assert(total.head._3 == nDocs)

    for (dim <- Seq("lang", "quality_quintile", "len_magnitude")) {
      val cells = rows.filter(_._1 == dim)
      assert(cells.nonEmpty, s"dimension $dim missing")
      assert(cells.map(_._3).sum == nDocs, s"$dim docs don't sum to total")
      assert(cells.map(_._4).sum == total.head._4, s"$dim tokens don't sum to total")
      assert(cells.map(_._2).distinct.length == cells.length, s"$dim cells not unique")
    }
    // lang marginal agrees with a direct groupBy
    val direct = docs.select(TextOps.langId(col("text")).as("lang"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val viaReport = rows.filter(_._1 == "lang").map(r => r._2 -> r._3).toMap
    assert(viaReport == direct)
  }

  test("reportStream: drained windowed marginals match the batch card per window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val varied = "the quick brown fox jumps over a lazy dog near the river"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val stream = mem.toDS().toDF("doc_id", "text", "event_time")
    val query = CorpusReport.reportStream(stream, windowLen = "1 hour",
        watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("card_out").outputMode("append").start()
    try {
      mem.addData(Seq(
        (1L, varied, t("2024-01-01 00:10:00")),
        (2L, varied + " extra", t("2024-01-01 00:20:00")),
        (3L, "el la los de es si no", t("2024-01-01 01:10:00"))))
      query.processAllAvailable()
      // close both windows
      mem.addData(Seq((9L, "flush", t("2024-01-01 05:00:00"))))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("card_out")
      .select(col("window.start").cast("long").as("w"), col("dimension"),
        col("value"), col("n_docs"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val w0 = t("2024-01-01 00:00:00").getTime / 1000
    val w1 = t("2024-01-01 01:00:00").getTime / 1000
    assert(out((w0, "total", null)) == 2L)
    assert(out((w0, "lang", "en")) == 2L)
    assert(out((w1, "total", null)) == 1L)
    assert(out((w1, "lang", "es")) == 1L)
    // every dimension's cells sum to the window total
    for (w <- Seq(w0, w1); dim <- Seq("lang", "quality_quintile", "len_magnitude")) {
      val cells = out.collect { case ((ww, d, _), n) if ww == w && d == dim => n }
      assert(cells.sum == out((w, "total", null)), s"window $w dim $dim")
    }
  }

  test("report is ONE scan and one aggregate: Expand, not a union of scans") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val plan = CorpusReport.report(docs).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"grouping sets must plan as Expand:\n${plan.take(600)}")
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected exactly one corpus scan, got $scans")
  }
}
