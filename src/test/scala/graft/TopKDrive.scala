package graft
import org.apache.spark.sql.SparkSession
import graft.functions.{Scored, TopKAggregator}
object TopKDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // top-2 orders by totalprice per customer, over the real fixture table
    val top = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice").as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => Scored(r._2, r._3))
      .agg(TopKAggregator(2).toColumn.name("topk"))
    top.take(3).foreach { case (cust, scored) =>
      println(s"[topk] cust=$cust -> ${scored.map(s => s"${s.id}@${s.score}").mkString(", ")}")
    }
    println(s"[topk] groups=${top.count()}")
    spark.stop()
  }
}
