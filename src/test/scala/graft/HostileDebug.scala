package graft
import org.apache.spark.sql.SparkSession
/** Dev: run named queries against a hostile dir, print full stacks. */
object HostileDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/hostile/empty")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      try {
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(s"[dbg] OK $name rows=$n")
      } catch { case t: Throwable =>
        println(s"[dbg] FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
        t.getStackTrace.filter(_.getClassName.startsWith("graft")).take(6)
          .foreach(e => println(s"[dbg]   at $e"))
        var c = t.getCause
        while (c != null) {
          println(s"[dbg] cause: ${c.getClass.getName}: ${String.valueOf(c.getMessage).take(200)}")
          c.getStackTrace.filter(_.getClassName.startsWith("graft")).take(4)
            .foreach(e => println(s"[dbg]   at $e"))
          c = c.getCause
        }
      }
    }
    spark.stop()
  }
}
