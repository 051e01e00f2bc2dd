package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan dumper: `sbt "Test/runMain graft.PlanDump <query> [sfDir]"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q62_lateral_topn")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
