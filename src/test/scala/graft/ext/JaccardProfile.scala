package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Hashing

/** Scratch stage-by-stage profiler for the slow bench queries (not a spec;
  * run with `sbt "Test/runMain graft.ext.JaccardProfile"`).
  */
object JaccardProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count()

    if (args.contains("--plan")) {
      println(graft.SparkEntry.queries("q35_jaccard_pairs")(spark, dir)
        .queryExecution.executedPlan.toString)
      spark.stop()
      return
    }

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val shingleArr = TextOps.shingleSet(col("text"), 3)
      time("shingleSet scan")(docs.select(size(shingleArr).as("n"))
        .agg(sum("n")).collect())
      val exploded = docs.select(col("doc_id").as("id"), explode(shingleArr).as("sh"))
      time("explode")(exploded.count())
      val buckets = exploded.groupBy("sh")
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      time("buckets (groupBy sh + collect_list)")(buckets.count())
      time("md5 of shingles (q36 path)")(
        exploded.select(Hashing.md5Hash32(0, col("sh")).as("h"))
          .agg(sum("h")).collect())
      val pairs = time("pairCombos explode")(
        buckets.select(explode(
          flatten(transform(col("ids"), (x, i) =>
            transform(slice(col("ids"), i + 2, size(col("ids"))),
              y => struct(x.as("a"), y.as("b")))))).as("p"))
          .select(col("p.a").as("id_a"), col("p.b").as("id_b")))
      time("pairs count")(pairs.count())
      time("inter groupBy")(pairs.groupBy("id_a", "id_b").agg(count(lit(1))).count())
      time("q35 full")(graft.SparkEntry.queries("q35_jaccard_pairs")(spark, dir).count())
      time("q36 full")(graft.SparkEntry.queries("q36_minhash_pairs")(spark, dir).count())
      time("q46 full")(graft.SparkEntry.queries("q46_dedup_clusters")(spark, dir).count())
    }
    spark.stop()
  }
}
