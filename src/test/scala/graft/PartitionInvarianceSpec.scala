package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Dedup, Sampling}

/** Distributed-correctness pins: operator results must be invariant to
  * physical row placement (input repartitioning) and to the shuffle
  * width (`spark.sql.shuffle.partitions`). The oracle gate proves
  * determinism at ONE configuration; these tests prove the property that
  * actually matters on a 1000-executor cluster, where both vary.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def requireFixtures(): Unit =
    assume(new java.io.File(dir).isDirectory, s"fixture dir $dir not present")

  private def rows(df: org.apache.spark.sql.DataFrame): List[String] =
    df.collect().map(_.toString).sorted.toList

  test("hash sampling, mixture, and split tags are invariant to input repartitioning") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val shuffled = docs.repartition(7, col("lang")) // co-locate by an unrelated key
    assert(rows(Sampling.hashSample(docs, col("doc_id"), 1000)) ==
      rows(Sampling.hashSample(shuffled, col("doc_id"), 1000)))
    assert(rows(Sampling.mixtureSample(docs, col("doc_id"), col("source"), Map("src0" -> 2500))) ==
      rows(Sampling.mixtureSample(shuffled, col("doc_id"), col("source"), Map("src0" -> 2500))))
    assert(rows(docs.select(col("doc_id"), Sampling.splitTag(col("doc_id")).as("s"))) ==
      rows(shuffled.select(col("doc_id"), Sampling.splitTag(col("doc_id")).as("s"))))
  }

  test("dedup keep-sets and cluster labels are invariant to input repartitioning") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val shuffled = docs.repartition(5)
    assert(rows(Dedup.exactDedup(docs).select("doc_id")) ==
      rows(Dedup.exactDedup(shuffled).select("doc_id")))
    assert(rows(Dedup.nearDupClusters(docs, Dedup.minhashPairs(docs))) ==
      rows(Dedup.nearDupClusters(shuffled, Dedup.minhashPairs(shuffled))))
  }

  test("histogram-rank family is invariant to placement AND prefix-sum width") {
    // the r18 cumHist engine's one distributed-correctness risk is its
    // partitioning-dependence: per-partition offsets must compose to the
    // SAME exact ranks whatever the range-partition layout. Vary both
    // the input placement and the shuffle width the prefix-sum runs at.
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val shuffled = docs.repartition(7, col("lang"))
    val scored = docs.select(col("doc_id"),
      graft.ext.TextOps.qualityScorePpm(col("text")).as("q"))
    val scoredSh = shuffled.select(col("doc_id"),
      graft.ext.TextOps.qualityScorePpm(col("text")).as("q"))
    assert(rows(graft.ops.Stats.pooledGridHist(scored, col("q"))) ==
      rows(graft.ops.Stats.pooledGridHist(scoredSh, col("q"))))
    assert(rows(graft.ops.Stats.ntileHist(scored, 5, col("q"), col("doc_id"), "t")) ==
      rows(graft.ops.Stats.ntileHist(scoredSh, 5, col("q"), col("doc_id"), "t")))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val one = rows(graft.ops.Stats.pooledGridHist(scored, col("q")))
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val thirteen = rows(graft.ops.Stats.pooledGridHist(scored, col("q")))
      assert(one == thirteen)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("KEYED histogram-rank family is invariant to placement AND prefix-sum width") {
    // cumHistByKey composes per-(partition, key) subtotals across range
    // partitions — the same layout-dependence class as cumHist, one
    // level down. Vary input placement and the shuffle width the keyed
    // prefix-sum runs at; the within-key ranks must not move.
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val scored = docs.select(col("doc_id"), col("lang"),
      graft.ext.TextOps.qualityScorePpm(col("text")).as("q"))
    val scoredSh = docs.repartition(7, col("source")).select(col("doc_id"),
      col("lang"), graft.ext.TextOps.qualityScorePpm(col("text")).as("q"))
    def pct(df: org.apache.spark.sql.DataFrame): List[String] =
      rows(graft.ext.TextOps.percentileRankPpm(df, col("lang"), col("q")))
    assert(pct(scored) == pct(scoredSh))
    assert(rows(graft.ops.Stats.groupEcdf(scored, col("doc_id"), col("lang"), col("q"))) ==
      rows(graft.ops.Stats.groupEcdf(scoredSh, col("doc_id"), col("lang"), col("q"))))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val one = pct(scored)
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val thirteen = pct(scored)
      assert(one == thirteen)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("round-4 operators are invariant to input repartitioning") {
    requireFixtures()
    import graft.ops.{Skew, Stats}
    val events = Tables.events(spark, dir)
    val eventsShuffled = events.repartition(7, col("event_type"))
    // salted aggregation: rand() salt values differ per layout, the
    // merged aggregate must not
    assert(rows(Skew.saltedSum(events, Seq("event_type"), floor(col("value")).cast("long"))) ==
      rows(Skew.saltedSum(eventsShuffled, Seq("event_type"), floor(col("value")).cast("long"))))
    // decimal component sums: order-independent by construction
    val li = Tables.lineitem(spark, dir)
    assert(rows(Stats.corrComponents(li, col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))) ==
      rows(Stats.corrComponents(li.repartition(9), col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))))
    // typed top-k aggregator: k-bounded partial merge must keep the
    // deterministic (score desc, id asc) order whatever the partial split
    import graft.functions.{Scored, TopKAggregator}
    import spark.implicits._
    def topk(orders: org.apache.spark.sql.DataFrame): List[String] = rows {
      orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Long, Double)]
        .map { case (k, id, price) => (k, Scored(id, price)) }
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(TopKAggregator(3).toColumn.name("top"))
        .toDF("o_custkey", "top")
    }
    val orders = Tables.orders(spark, dir)
    assert(topk(orders) == topk(orders.repartition(11)))
  }

  test("round-6 operators are invariant to input repartitioning") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val docsShuffled = docs.repartition(7)
    assert(rows(Dedup.duplicateSpans(docs, k = 6)) ==
      rows(Dedup.duplicateSpans(docsShuffled, k = 6)))
    val emb = Tables.embeddings(spark, dir)
    val embShuffled = emb.repartition(9)
    assert(rows(Dedup.semanticDupPairs(emb, threshold = 0.35, nlist = 8)) ==
      rows(Dedup.semanticDupPairs(embShuffled, threshold = 0.35, nlist = 8)))
    assert(rows(Dedup.semanticDedup(emb, threshold = 0.35, nlist = 8).select("vec_id")) ==
      rows(Dedup.semanticDedup(embShuffled, threshold = 0.35, nlist = 8).select("vec_id")))
    // lmScoreBuckets is DELIBERATELY absent: its percentile_approx
    // cutoffs are layout-dependent by documented contract
  }

  test("query results are invariant to the shuffle width") {
    requireFixtures()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // partition-count-sensitive shapes: bucket collect_list (q35),
    // iterative clustering (q46), rank selection (q57), window+bin (q66);
    // round 4: typed top-k partial merge (q95), gaps-and-islands windows
    // (q91), bigram head-count window (q89), LSH band buckets (q93)
    // round 11: corpus-derived resample weights (q113), two-phase
    // histogram+boundary budget selection (q114)
    // round-11 continuation: iterative integer PageRank (q124, partial
    // sums merge across partitions), boilerplate covered-index union
    // (q119), priority-sample TakeOrdered merge (q133), MAD double-pass
    // rank selection (q135), BM25 integer-micro sum merge (q131)
    val sensitive = Seq("q35_jaccard_pairs", "q46_dedup_clusters",
      "q57_percentiles", "q66_packing",
      "q95_topk_aggregator", "q91_sessionize_batch", "q89_bigram_lm",
      "q93_lsh_band_stats", "q113_temperature_sample", "q114_token_budget",
      "q124_pagerank", "q119_boilerplate_scrub", "q133_weighted_sample",
      "q135_mad_outliers", "q131_bm25_topk")
    def run(n: String): Map[String, List[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", n)
      sensitive.map(q => q -> rows(SparkEntry.queries(q)(spark, dir))).toMap
    }
    try {
      val narrow = run("3")
      val wide = run("17")
      sensitive.foreach { q =>
        assert(narrow(q) == wide(q), s"$q diverged across shuffle widths")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("behavior analytics and graph operators are invariant to input repartitioning") {
    requireFixtures()
    import graft.ops.{Behavior, Graph}
    val ev = Tables.events(spark, dir)
    val evShuffled = ev.repartition(7, col("event_type")) // unrelated key
    assert(rows(Behavior.scdType2(ev, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))) ==
      rows(Behavior.scdType2(evShuffled, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))))
    assert(rows(Behavior.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))) ==
      rows(Behavior.funnel(evShuffled, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))))
    assert(rows(Behavior.retentionCohorts(ev, col("user_id"), col("ts"))) ==
      rows(Behavior.retentionCohorts(evShuffled, col("user_id"), col("ts"))))
    val e = ev.select((col("user_id") % 7).as("src"), (col("user_id") % 5).as("dst"))
    val eShuffled = e.repartition(9)
    assert(rows(Graph.pageRankPpm(e, col("src"), col("dst"), iters = 3)) ==
      rows(Graph.pageRankPpm(eShuffled, col("src"), col("dst"), iters = 3)))
  }
}
