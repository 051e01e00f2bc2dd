package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the round-11 balancing/selection operators (dev
  * tool): `Test/runMain graft.BalanceThroughput [nDocs]` — synthetic
  * corpus (same generator shape as [[DedupThroughput]], plus a Zipf-ish
  * skewed source column) through `Sampling.temperatureResample`,
  * `Sampling.selectTokenBudget[PerKey]`, `TextOps.sourceReputation`,
  * `Sampling.importanceResample`, and `Dedup.editDistancePairs`
  * (short-text column per its cost contract), printing docs/sec.
  */
object BalanceThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.find(a => a.nonEmpty && a.forall(_.isDigit)).map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def words(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 55).map(i =>
        concat(lit("w"), pmod(hash(id, lit(i)), lit(5000)).cast("string"))): _*)
    // Zipf-ish source skew: src0 holds ~half the corpus, then halving tail
    val srcExpr = concat(lit("src"),
      floor(log2(pmod(hash(col("id"), lit(99)), lit(1 << 16)) + 1)).cast("long"))
    val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0 && col("id") > 0, words(col("id") - 1))
          .otherwise(words(col("id"))).as("text"),
        srcExpr.as("source"))
      .localCheckpoint(true)
    // short-text twin for the FastSS probe (its documented domain)
    val titles = docs.select(col("doc_id"),
        concat_ws(" ", (0 until 6).map(i =>
          concat(lit("t"), pmod(hash(col("doc_id") / 10, lit(i)), lit(800))
            .cast("string"))): _*).as("text"))
      .localCheckpoint(true)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[balance-tput] $label%-24s ${sec}%7.2f s  ${(n / sec).toLong}%8d docs/s")
      r
    }

    time("warmup scan")(docs.count())
    time("temperatureResample")(graft.ext.Sampling.temperatureResample(
      docs, col("doc_id"), col("source")).count())
    time("sourceReputation")(graft.ext.TextOps.sourceReputation(
      docs, minMeanPpm = 600000L).count())
    time("selectTokenBudget")(graft.ext.Sampling.selectTokenBudget(
      docs.withColumn("q", graft.ext.TextOps.qualityScorePpm(col("text")))
        .withColumn("t", graft.ext.TextOps.tokenCount(col("text"))),
      col("doc_id"), col("q"), col("t"), budget = n * 25L).count())
    time("selectTokenBudgetPerKey")(graft.ext.Sampling.selectTokenBudgetPerKey(
      docs.withColumn("q", graft.ext.TextOps.qualityScorePpm(col("text")))
        .withColumn("t", graft.ext.TextOps.tokenCount(col("text"))),
      col("doc_id"), col("source"), col("q"), col("t"),
      budgets = Map.empty, defaultBudget = n * 3L).count())
    time("importanceResample")(graft.ext.Sampling.importanceResample(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0)).count())
    time("editDistancePairs(6tok)")(graft.ext.Dedup.editDistancePairs(
      titles, maxDist = 10L, maxBucketSize = 64).count())
    spark.stop()
  }
}
