package graft
import org.apache.spark.sql.SparkSession
object CurationDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.01")
    val (curated, stats) = graft.jobs.CorpusCuration.curate(docs,
      allowedLangs = Set("en", "und"), minQualityPpm = 400000L,
      sampleRates = Map("en" -> 8000), defaultSampleBp = 2000)
    println(s"[curate] $stats")
    curated.groupBy("lang_guess", "split").count().orderBy("lang_guess", "split")
      .collect().foreach(r => println(s"[curate] ${r.mkString(" ")}"))
    curated.unpersist()
    spark.stop()
  }
}
