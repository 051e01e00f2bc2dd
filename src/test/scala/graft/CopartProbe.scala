package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does `repartition(col).sortWithinPartitions(col)` +
  * `localCheckpoint(false)` carry its HashPartitioning/ordering through
  * the LogicalRDD into a later join (edge side needs NO per-round
  * exchange/sort)? Prints the join plans with/without pre-partitioning.
  */
object CopartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e0 = (1 to 100000).map(i => (i % 500L, (i * 7) % 500L)).toDF("src", "dst")
      .filter(col("src") =!= col("dst"))
    val ranks = (0 until 500).map(i => (i.toLong, 1000000L)).toDF("node", "ppm")
      .filter(col("ppm") > 0)

    val ePlain = e0.localCheckpoint(false)
    val ePart = e0.repartition(col("src")).sortWithinPartitions("src")
      .localCheckpoint(true)
    val ePartNoAqe = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val d = e0.repartition(col("src")).sortWithinPartitions("src")
        .localCheckpoint(false)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      d
    }

    def shuffles(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val n = plan.linesIterator.count(l =>
        l.contains("Exchange ") && !l.contains("Broadcast") && !l.contains("Reused"))
      println(s"--- shuffle exchanges: $n")
      plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Sort ") || l.contains("Scan ExistingRDD"))
        .foreach(l => println(l.take(140)))
    }
    // force SMJ path (disable broadcast) so the partitioning question is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println("===== plain checkpoint join =====")
    shuffles(ePlain.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy("dst").agg(sum(col("ppm")).as("s")))
    println("===== pre-partitioned EAGER checkpoint join =====")
    shuffles(ePart.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy("dst").agg(sum(col("ppm")).as("s")))
    println("===== pre-partitioned lazy, AQE off at build =====")
    shuffles(ePartNoAqe.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy("dst").agg(sum(col("ppm")).as("s")))
    spark.stop()
  }
}
