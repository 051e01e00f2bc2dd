package graft
import org.apache.spark.sql.SparkSession
object ProbeQ4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q83_histogram","q84_corr_components","q85_html_strip","q86_quality_funnel",
      "q87_bloom_semi_join","q88_zipf_coverage","q89_bigram_lm","q90_full_outer",
      "q91_sessionize_batch","q92_lexical_diversity","q93_lsh_band_stats","q94_salted_agg",
      "q95_topk_aggregator")
    // warm
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"[probe] $n ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
