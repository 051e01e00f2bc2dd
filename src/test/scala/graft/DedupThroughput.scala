package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-path throughput probe (dev tool):
  * `Test/runMain graft.DedupThroughput [nDocs]` — generates a synthetic
  * corpus (~55 tokens/doc, 10% exact dups, 5% near-dups) and measures
  * docs/sec through the production dedup stages: exact dedup, MinHash
  * signatures, LSH candidate pairs, and cluster labels.
  */
object DedupThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~55-token docs from a deterministic vocabulary; ids ending in 0
    // copy the previous doc (exact dup), ids ending in 5 copy it with a
    // one-word change (near dup)
    // hash-based word selection — a linear id formula here makes
    // structurally correlated docs that explode the LSH candidate count
    // far beyond anything a real corpus produces
    def words(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 55).map(i =>
        concat(lit("w"), pmod(hash(id, lit(i)), lit(5000)).cast("string"))): _*)
    val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0 && col("id") > 0, words(col("id") - 1)) // exact dup of prior doc
        .otherwise(words(col("id"))).as("text"))
      .localCheckpoint(true)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[dedup-tput] $label%-24s ${sec}%7.2f s  ${(n / sec).toLong}%8d docs/s")
      r
    }

    time("warmup scan")(docs.count())
    time("exactDedup")(graft.ext.Dedup.exactDedup(docs).count())
    // hot-fingerprint skew probe: 30% of the corpus is ONE document (the
    // boilerplate-page scenario). The old fingerprint-window formulation
    // serialized every copy into a single WindowExec task; the groupBy +
    // (fp, id) semi join keeps the hot group partition-parallel. The
    // window formulation is timed alongside for the comparison.
    val skewed = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(col("id") % 10 < 3,
        lit("the same boilerplate page body repeated verbatim across the corpus"))
        .otherwise(words(col("id"))).as("text"))
      .localCheckpoint(true)
    time("exactDedup 30% hot fp")(graft.ext.Dedup.exactDedup(skewed).count())
    time("window dedup 30% hot fp") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(graft.ext.TextOps.fingerprint(col("text")))
      skewed.withColumn("__keep", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("__keep")).drop("__keep").count()
    }
    time("minhash signatures")(
      graft.ext.Dedup.minhashSignatureArray(docs).agg(sum(element_at(col("sig"), 1))).collect())
    val pairs = time("minhashPairs (LSH)")(
      graft.ext.Dedup.minhashPairs(docs).localCheckpoint(true))
    println(s"[dedup-tput] candidate pairs: ${pairs.count()}")
    time("nearDupClusters")(
      graft.ext.Dedup.nearDupClusters(docs, pairs).count())
    time("nearDupClustersLSS")(
      graft.ext.Dedup.nearDupClustersLSS(docs, pairs).count())
    time("duplicateSpans k=8")(
      graft.ext.Dedup.duplicateSpans(docs, k = 8).count())
    time("bpe tokenCount (50 merges)") {
      val merges = graft.ext.Bpe.trainMerges(docs.limit(20000), numMerges = 50)
      docs.select(sum(graft.ext.Bpe.tokenCount(col("text"), merges))).collect()
    }
    spark.stop()
  }
}
