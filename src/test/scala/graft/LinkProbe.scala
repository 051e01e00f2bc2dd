package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the q118/q215/q233 optimization loop:
  * `Test/runMain graft.LinkProbe [sfDir] [passes]` — times the three
  * edit-distance / prefix-join queries, reporting per-pass wall time and
  * the min across passes (the Bench convention for stripping scheduler
  * noise). Not a driver surface.
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q118_edit_dist_pairs", "q215_record_linkage",
      "q233_jaccard_prefix")
    // one warmup pass on sf0.001 so codegen/JIT is out of the timings
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[link-probe] $n%-24s min=${times.min}%6.2f s  " +
        times.map(t => f"$t%.2f").mkString("passes=[", ", ", "]"))
    }
    spark.stop()
  }
}
