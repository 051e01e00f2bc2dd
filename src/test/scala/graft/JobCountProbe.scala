package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe for the r19→r20 driver-vs-probe contradiction (VERDICT r19
  * item 6): times named queries (min of `SPARK_GRAFT_PROBE_PASSES`,
  * default 5, after an sf0.001 warm-up) AND records the number of Spark
  * JOBS each pass submits — the lazy-checkpoint change's claimed win is
  * job count, so the job total is the direct evidence a revert decision
  * would need. `Test/runMain graft.JobCountProbe qA qB ...`
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "5").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q317_assortativity", "q318_shapley", "q307_cross_corr")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      val obs = (1 to passes).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
      }
      val ts = obs.map(_._1).sorted
      println(f"[jobcount] $n min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f s" +
        s" jobs=${obs.map(_._2).mkString(",")}" +
        f" (passes: ${obs.map(o => f"${o._1}%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
