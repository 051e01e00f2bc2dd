package graft

/** Prints condensed physical plans for representative queries (dev tool). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q01_tumble_alerts", "q03_filter_project", "q04_pricing_summary",
      "q06_join5_revenue", "q07_semi_join", "q11_rollup", "q13_rank_topn", "q27_asof_join")
    interesting.foreach { name =>
      println(s"\n########## $name")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // condense: keep operator lines only
      plan.linesIterator
        .filter(l => l.contains("*(") || l.contains("+-") || l.contains(":-"))
        .map(_.take(160))
        .foreach(println)
    }
    spark.stop()
  }
}
