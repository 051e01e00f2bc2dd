package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.ext.TextOps

class CorpusReportSpec extends SparkTestBase {
  import spark.implicits._

  test("report marginals are consistent: each dimension sums to the grand total") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
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

  test("report is ONE scan and one aggregate: Expand, not a union of scans") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = CorpusReport.report(docs).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"grouping sets must plan as Expand:\n${plan.take(600)}")
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected exactly one corpus scan, got $scans")
  }
}
