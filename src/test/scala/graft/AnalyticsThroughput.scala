package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the round-11 analytics/graph/dedup additions
  * (dev tool): `Test/runMain graft.AnalyticsThroughput [nRows]` —
  * synthetic 1M-row event log (100k users) through `Behavior.{scdType2,
  * funnel, retentionCohorts}`, a 3M-edge graph through
  * `Graph.pageRankPpm`, and a 1M-doc corpus through
  * `Dedup.truncationDupGroups` and the q119 boilerplate-scrub
  * composition, printing rows/sec.
  */
object AnalyticsThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.find(a => a.nonEmpty && a.forall(_.isDigit)).map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val types = array(Seq("view", "click", "purchase", "error", "signup").map(lit): _*)
    val events = spark.range(n.toLong).select(
        col("id").as("event_id"),
        (col("id") % math.max(n / 10, 1)).as("user_id"),
        timestamp_seconds(lit(1704067200L) + pmod(hash(col("id")), lit(2592000))).as("ts"),
        element_at(types, (pmod(hash(col("id"), lit(7)), lit(5)) + 1).cast("int")).as("event_type"))
      .localCheckpoint(true)

    def words(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 55).map(i =>
        concat(lit("w"), pmod(hash(id, lit(i)), lit(5000)).cast("string"))): _*)
    val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0 && col("id") > 0, words(col("id") - 1))
          .otherwise(words(col("id"))).as("text"))
      .localCheckpoint(true)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[analytics-tput] $label%-24s ${sec}%7.2f s  ${(n / sec).toLong}%8d rows/s")
      r
    }

    time("warmup scan")(events.count() + docs.count())
    time("scdType2")(graft.ops.Behavior.scdType2(events,
      col("user_id"), col("ts"), col("event_type"), col("event_id")).count())
    time("funnel(3 stages)")(graft.ops.Behavior.funnel(events,
      col("user_id"), col("ts"), col("event_type"),
      Seq("view", "click", "purchase")).count())
    time("retentionCohorts")(graft.ops.Behavior.retentionCohorts(events,
      col("user_id"), col("ts")).count())
    // 3 out-edges per node over n nodes — 3n-edge graph, 3 PR rounds
    val edges = docs.select(col("doc_id").as("src"),
      explode(array((col("doc_id") * 7 + 1) % n, (col("doc_id") * 13 + 5) % n,
        (col("doc_id") * 31 + 11) % n)).as("dst"))
    time("pageRankPpm(3 iters)")(graft.ops.Graph.pageRankPpm(edges,
      col("src"), col("dst"), iters = 3).count())
    time("truncationDupGroups")(graft.ext.Dedup.truncationDupGroups(
      docs, kPrefix = 32).count())
    time("boilerplateScrub(q119)")({
      val spans = graft.ext.Dedup.duplicateSpans(docs, k = 8, minDocs = 2)
      // aggregate the scrubbed TEXT — a bare count() lets Catalyst
      // eliminate the unique-right left join and skip the whole scrub
      graft.ext.Dedup.scrubDuplicateSpans(docs, spans)
        .agg(sum(length(col("text")))).collect()
    })
    spark.stop()
  }
}
