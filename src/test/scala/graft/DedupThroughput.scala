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
    // args are positionless: the first all-digit arg is n, and the literal
    // "stars" flag may come before or after it ("stars" alone works too)
    val n = args.find(a => a.nonEmpty && a.forall(_.isDigit)).map(_.toInt).getOrElse(200000)
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
    val starsOnly = args.contains("stars")
    lazy val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
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

    if (!starsOnly) {
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
    }
    // hub-skew star-step probe: one hub node adjacent to 30% of all nodes
    // — the component-minimum shape every LSS run reaches at its fixed
    // point, where the min-label node's neighborhood IS its component.
    // The pre-round-9 window-min star step buffered that whole
    // neighborhood in a single WindowExec task; the groupBy-min +
    // join-back step keeps it partition-parallel. The window formulation
    // is timed alongside for the comparison. (`stars` as the second arg
    // runs ONLY this probe — the hub sizes where the ceiling bites are
    // larger than the full probe's corpus stages want to run at.)
    locally {
      val hub = spark.range(1L, n.toLong * 3 / 10)
        .select(lit(0L).as("lo"), col("id").as("hi"))
      val sparse = spark.range(n.toLong * 3 / 10, n.toLong)
        .select(pmod(hash(col("id")), col("id")).cast("long").as("lo"),
          col("id").as("hi"))
        .filter(col("lo") < col("hi"))
      val edges = hub.union(sparse).localCheckpoint(true)
      time("largeStarStep hub 30%")(graft.ext.Dedup.largeStarStep(edges).count())
      time("window largeStar hub 30%") {
        import org.apache.spark.sql.expressions.Window
        val nbrs = edges.select(col("lo").as("a"), col("hi").as("b"))
          .union(edges.select(col("hi").as("a"), col("lo").as("b")))
        val m = least(min(col("b")).over(Window.partitionBy(col("a"))), col("a"))
        nbrs.withColumn("m", m)
          .filter(col("b") > col("a"))
          .select(col("m").as("lo"), col("b").as("hi"))
          .distinct().count()
      }
    }
    if (!starsOnly) {
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
    }
    spark.stop()
  }
}
