package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the round-11 curation operators (dev tool):
  * `Test/runMain graft.CurationThroughput [nDocs]` — synthetic corpus
  * (same generator shape as [[DedupThroughput]]) through
  * `CorpusCuration.auditVerdicts`, `ops.Snapshot.diff`, and
  * `Dedup.keepCanonicalBy`, printing docs/sec per stage.
  */
object CurationThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.find(a => a.nonEmpty && a.forall(_.isDigit)).map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def words(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 55).map(i =>
        concat(lit("w"), pmod(hash(id, lit(i)), lit(5000)).cast("string"))): _*)
    val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0 && col("id") > 0, words(col("id") - 1))
        .otherwise(words(col("id"))).as("text"))
      .localCheckpoint(true)
    // snapshot B: 1/13 removed, 1/7 edited, 1/11 re-added under new ids
    val snapB = docs.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + n.toLong).as("doc_id"), col("text")))
      .localCheckpoint(true)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[curation-tput] $label%-22s ${sec}%7.2f s  ${(n / sec).toLong}%8d docs/s")
      r
    }

    time("warmup scan")(docs.count())
    time("auditVerdicts")(jobs.CorpusCuration.auditVerdicts(docs).count())
    time("snapshotDiff")(ops.Snapshot.diff(docs, snapB).count())
    val pairs = graft.ext.Dedup.minhashPairs(docs)
    time("  minhashPairs alone")(pairs.count())
    time("  nearDupClusters alone")(
      graft.ext.Dedup.nearDupClusters(docs, pairs).count())
    time("keepCanonicalBy")(graft.ext.Dedup.keepCanonicalBy(
      docs, pairs,
      graft.ext.TextOps.qualityScorePpm(col("text"))).count())
    spark.stop()
  }
}
