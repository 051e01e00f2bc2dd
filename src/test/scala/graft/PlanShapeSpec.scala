package graft

/** Plan-shape proofs for the scale claims in SCALE.md: the point is not
  * that these queries return the right rows (the oracle gate covers that)
  * but that Catalyst produces the plan we designed for — filters reach the
  * parquet scan, projections prune the read schema, small sides broadcast,
  * aggregates are partial+final, and the hot paths stay inside
  * whole-stage codegen. A regression here is invisible to correctness
  * checks and only shows up as a 100× scan at scale.
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

  /** Skip (not fail) the suite on machines without the generated fixtures,
    * same contract as SimSearchSpec's recall test.
    */
  private def requireFixtures(): Unit =
    assume(new java.io.File(dir).isDirectory, s"fixture dir $dir not present")

  private def plan(name: String): String = {
    requireFixtures()
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
  }

  /** Final adaptive plan — AQE inserts WholeStageCodegen per query stage
    * only at execution, so codegen assertions must run the query first.
    */
  private def finalPlan(name: String): String = {
    requireFixtures()
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // count() would build a NEW plan; collect() runs THIS one
    df.queryExecution.executedPlan.toString
  }

  test("q03 filter+project: predicate pushed to parquet, read schema pruned") {
    val p = plan("q03_filter_project")
    val scan = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scan.contains("GreaterThan(l_quantity"),
      s"l_quantity > 45 must reach the scan as a pushed filter: $scan")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_shipdate"),
      s"read schema must contain only referenced columns: $read")
  }

  test("q01 windowed alert: partial+final hash aggregation (map-side combine)") {
    val p = plan("q01_tumble_alerts")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs in:\n${p.take(800)}")
    assert(p.contains("partial_count"), "partial aggregation (map-side combine) missing")
  }

  test("q06 five-way join: dimension sides broadcast, no cartesian anywhere") {
    val p = plan("q06_join5_revenue")
    assert(p.contains("BroadcastHashJoin"),
      s"small dims must broadcast:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), "no cartesian product expected")
  }

  test("q37 brute-force cosine: query side broadcast, corpus never shuffles pre-rank") {
    val p = plan("q37_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"broadcast queries x corpus scan expected:\n${p.take(800)}")
    // the only hash exchanges are for the per-query window rank + ordering
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"corpus must not shuffle before ranking ($exchanges exchanges)")
  }

  test("q41 pivot-IVF: centroids broadcast for map-side assignment") {
    val p = plan("q41_ann_ivf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"pivot set must broadcast:\n${p.take(800)}")
  }

  /** Codegen stages appear as `WholeStageCodegen (n)` in formatted plans
    * but as `*(n)` operator prefixes in the AQE final-plan tree string —
    * accept either notation.
    */
  private def hasCodegenStage(p: String): Boolean =
    p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(p).isDefined

  test("q62 lateral top-N: decorrelated to WindowGroupLimit (partial before shuffle), no nested loop") {
    val p = plan("q62_lateral_topn")
    assert(p.contains("WindowGroupLimit"),
      s"LATERAL ... LIMIT must decorrelate to a rank-limit pushdown:\n${p.take(800)}")
    assert(p.contains("Partial"),
      "top-k must be applied map-side before the o_custkey shuffle")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "per-customer correlation must become an equi-join, not a nested loop")
  }

  test("q68 contamination: benchmark shingle dictionary broadcasts, corpus side never shuffles pre-count") {
    val p = plan("q68_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n${p.take(800)}")
  }

  test("q75 rollup cascade: daily grain computed from hourly partials, events scanned ONCE") {
    val p = plan("q75_rollup_cascade")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      s"cascade must not rescan raw events per grain:\n${p.take(800)}")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 4, s"two partial+final aggregation levels expected, got $aggs")
  }

  test("q66 packing: one per-group sort shuffle feeds both the window and the bin aggregate") {
    val p = plan("q66_packing")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2,
      s"packing should shuffle on lang once for the window (+1 for the bin agg), got $exchanges")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "running token total must be a window, not a self-join")
  }

  test("q87 bloom semi join: probe-side pre-filter sits BELOW the join, join broadcasts") {
    val p = plan("q87_bloom_semi_join")
    val joinIdx = p.indexOf("LeftSemi")
    val udfIdx = p.indexOf("UDF")
    assert(joinIdx >= 0, s"exact semi join expected:\n${p.take(800)}")
    // the plan tree prints root-first, so a child appears AFTER its
    // parent in the string: the bloom UDF filter pruning the probe side
    // must sit strictly below the join node
    assert(udfIdx > joinIdx,
      s"bloom pre-filter (UDF) must prune the probe side UNDER the join " +
        s"(udf@$udfIdx, join@$joinIdx):\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), "no cartesian expected")
  }

  test("q86 quality funnel: single scan, no per-stage rescans") {
    val p = plan("q86_quality_funnel")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      s"funnel must compute all stages in ONE pass over documents:\n${p.take(800)}")
  }

  test("q96 grouping_id: rollup plans as Expand + partial/final aggregation") {
    val p = plan("q96_grouping_id")
    assert(p.contains("Expand"), s"rollup must plan as Expand:\n${p.take(800)}")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "partial+final aggregation expected over the expanded rows")
  }

  test("q83 histogram: one partial+final aggregate, bin share windows over the bin table") {
    val p = plan("q83_histogram")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1,
      s"histogram must shuffle once on the bin key, got $exchanges:\n${p.take(800)}")
    assert(p.contains("partial_count"), "map-side combine missing")
  }

  test("q35 whole-stage codegen covers the shingle/hash hot path") {
    val p = finalPlan("q35_jaccard_pairs")
    assert(hasCodegenStage(p), s"hot path fell out of codegen:\n${p.take(900)}")
  }

  test("q36 minhash: signature pipeline runs inside codegen stages") {
    val p = finalPlan("q36_minhash_pairs")
    assert(hasCodegenStage(p), s"hot path fell out of codegen:\n${p.take(900)}")
  }

  test("semanticDupPairs: pivot assign is a broadcast NLJ, cluster join is an equi-join") {
    requireFixtures()
    val emb = graft.core.Tables.embeddings(spark, dir)
    val p = graft.ext.Dedup.semanticDupPairs(emb, threshold = 0.35, nlist = 8)
      .queryExecution.executedPlan.toString
    // corpus × nlist pivots: the deliberate BOUNDED broadcast NLJ
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"pivot assignment must broadcast the centroid table:\n${p.take(900)}")
    // within-cluster scoring joins on cent_id — never an unbounded cartesian
    assert(!p.contains("CartesianProduct"),
      s"no cartesian allowed in the cluster pair join:\n${p.take(900)}")
  }

  test("duplicateSpans: gram dedup is a partial+final aggregate, no cartesian") {
    requireFixtures()
    val docs = graft.core.Tables.documents(spark, dir)
    val p = graft.ext.Dedup.duplicateSpans(docs, k = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span detection must stay equi-join shaped:\n${p.take(900)}")
    assert(p.contains("HashAggregate"), "gram-frequency aggregate missing")
  }

  test("BPE segmentation and model scoring are shuffle-free projections") {
    requireFixtures()
    val docs = graft.core.Tables.documents(spark, dir)
    val merges = Seq(("t", "h"), ("th", "e"))
    val pBpe = docs.select(graft.ext.Bpe.segment(
      org.apache.spark.sql.functions.col("text"), merges))
      .queryExecution.executedPlan.toString
    assert(!pBpe.contains("Exchange"), s"BPE apply must not shuffle:\n${pBpe.take(600)}")
    val pChunk = docs.select(graft.ext.TextOps.chunkTokens(
      org.apache.spark.sql.functions.col("text"), 128, 16))
      .queryExecution.executedPlan.toString
    assert(!pChunk.contains("Exchange"), s"chunking must not shuffle:\n${pChunk.take(600)}")
  }

  test("q113 temperature resample: weights broadcast, corpus never shuffles, one weight scan") {
    val p = plan("q113_temperature_sample")
    assert(p.contains("BroadcastHashJoin"),
      s"the |sources|-row weight table must broadcast (null-safe equi-join):\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // exactly 2 corpus scans: the weight-count pass and the resample pass.
    // A third scan means the totals window regressed to the agg+crossJoin
    // shape that re-executes the count lineage
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2, s"two-pass semantics = exactly 2 scans, got $scans")
    // the corpus side is projection + generate only — its sole Exchange
    // is the weight aggregation (plus the query's output sort)
    assert(p.contains("Generate explode"), "copy generator must be a Generate")
  }

  test("q114 token budget: histogram shared via checkpoint, class joins broadcast") {
    val p = plan("q114_token_budget")
    // the tiny cumulative-histogram table is checkpointed and feeds both
    // the keep-class and boundary-class branches: exactly 2 corpus scans
    // (histogram + base), not 4
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2, s"checkpoint must dedupe the histogram lineage, got $scans scans")
    assert(p.contains("BroadcastHashJoin"),
      s"class lists must broadcast:\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(!p.contains("Exchange rangepartitioning(__score"),
      "no corpus-wide global sort may appear")
  }

  test("q116 per-key budget: no single-partition exchange, class joins broadcast") {
    val p = plan("q116_budget_per_lang")
    // every stage is partitioned by stratum — the per-key variant has no
    // unpartitioned window at all (q114's tiny-histogram exception gone)
    assert(!p.contains("Exchange SinglePartition"),
      s"nothing may collapse to one partition:\n${p.take(900)}")
    assert(p.contains("BroadcastHashJoin"), "class lists must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q118 edit-distance pairs: codegen generator (no interpreted HOF), one sig shuffle") {
    val p = plan("q118_edit_dist_pairs")
    // the deletion variants come from an explode generator + per-row CASE,
    // never a transform() lambda (interpreted: measured 4.7 s vs 1.1 s)
    assert(p.contains("Generate explode(sequence"),
      s"signatures must come from the generator formulation:\n${p.take(900)}")
    assert(!p.toLowerCase.contains("lambdafunction"),
      "no interpreted higher-order lambda in the signature path")
    // exactly ONE aggregate pass over the signature stream (the bucket
    // build keyed on sig alone) — a distinct() on (id, sig) would
    // shuffle the dominant stream a second time
    assert(!p.linesIterator.exists(l =>
        l.contains("HashAggregate(keys=[id#") && l.contains("sig#")),
      "no (id, sig) distinct in the signature path")
    assert(p.contains("partial_"), "bucket build must map-side combine")
    assert(!p.contains("CartesianProduct"))
  }

  test("q117 importance resample: bigram models partial-agg, no cartesian, generator output") {
    val p = plan("q117_importance_sample")
    assert(p.contains("partial_count"),
      "bigram model counts must map-side combine")
    assert(!p.contains("CartesianProduct"), "model joins are equi-joins only")
    assert(p.contains("Generate explode"), "copy generator must be a Generate")
    // the target model carries an explicit broadcast hint
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"target model must broadcast:\n${p.take(900)}")
  }

  test("q115 source reputation: partial+final mean agg, reputation broadcast back") {
    val p = plan("q115_source_reputation")
    assert(p.contains("partial_sum"),
      "source mean must map-side combine (partial aggregation)")
    assert(p.contains("BroadcastHashJoin"),
      s"the |sources|-row reputation table must broadcast:\n${p.take(900)}")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never shuffle for the reputation join")
    assert(!p.linesIterator.exists(l => l.contains("Window")),
      "no window anywhere — this is agg + broadcast join only")
  }

}
