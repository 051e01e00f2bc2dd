package graft
import org.apache.spark.sql.SparkSession
object RecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5)
          |SELECT * FROM r ORDER BY n""".stripMargin)
      println("[rec] rows=" + df.collect().map(_.getInt(0)).mkString(","))
    } catch { case t: Throwable => println("[rec] FAIL " + t.getClass.getName + ": " + t.getMessage.take(200)) }
    spark.stop()
  }
}
