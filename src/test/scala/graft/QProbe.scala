package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe: `Test/runMain graft.QProbe qA qB ...`
  * times each named registry query at sf0.1 (override via
  * SPARK_GRAFT_SF_DIR), MIN of `SPARK_GRAFT_PROBE_PASSES` (default 3)
  * passes after an sf0.001 warm-up — the quiet-box convention for
  * adjudicating a single query's regression without a full Bench run.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q128_quality_percentile", "q251_source_ecdf",
        "q277_calibration", "q279_quantile_normalize")
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n min=${times.min}%.3f s (passes: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
