package graft.ext

import org.apache.spark.sql.functions._

/** Scratch timing for the shingle pipeline stages (not a test). */
object ShingleDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm")(docs.count())
    val arr = TextOps.shingleSet(col("text"), 3)
    time("shingleSet sizes only")(docs.select(size(arr).as("n")).agg(sum("n")).collect())
    time("explode shingles")(docs.select(explode(arr).as("sh")).agg(count(lit(1))).collect())
    time("explode+md5")(docs.select(explode(arr).as("sh"))
      .select(graft.functions.Hashing.md5Hash32(0, col("sh")).as("h")).agg(sum("h")).collect())
    time("groupBy collect_list")(docs.select(col("doc_id").as("id"), explode(arr).as("sh"))
      .groupBy("sh").agg(sort_array(collect_list(col("id"))).as("ids"))
      .agg(sum(size(col("ids")))).collect())
    time("full jaccard")(Dedup.jaccardPairs(docs, threshold = 0.5).count())
    time("full minhash")(Dedup.minhashPairs(docs).count())
    spark.stop()
  }
}
