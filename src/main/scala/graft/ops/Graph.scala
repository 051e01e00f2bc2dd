package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics — the iterative-dataflow family (PageRank-style
  * scoring) that complements the dedup module's connected components
  * (`ext.Dedup.clusterLabels*`). A web-scale corpus carries a link graph
  * (URL → URL), and link-based authority is a standard quality prior for
  * training-data selection (the OPEN web-crawl pipelines gate on
  * domain-level rank).
  */
object Graph {

  /** PageRank with INTEGER ppm arithmetic — every rank is a BIGINT ppm
    * (initial mass 1,000,000 per node) and every step is a floor
    * division, so the result is bit-exact across engines, partitionings
    * and run orders (float PageRank is none of those: the sum order
    * changes the low bits). Per iteration:
    * `r'(v) = (100-damp)·10⁴ + (damp · Σ_{u→v} r(u) div outdeg(u)) div 100`.
    * Nodes without in-links keep the base mass; dangling nodes (no
    * out-links) leak their mass, the standard simplification.
    *
    * Scale shape: each iteration is one join of ranks onto edges keyed
    * by src (with edges bucketed/pre-partitioned by src this
    * co-locates) and one sum-aggregate keyed by dst — the canonical
    * 2-shuffle PageRank round. Ranks are LAZILY `localCheckpoint`ed
    * per iteration so the plan stays O(1) deep regardless of `iters`
    * (the same lineage-truncation contract as
    * `Dedup.clusterLabelsLargeSmallStar`); lazy because nothing
    * driver-side reads a round before the caller's action — an eager
    * checkpoint would spend one dedicated result-stage job per round,
    * where the lazy one folds materialization into the consuming job
    * (measured −13% on this operator, −24% on [[hits]], at the bench
    * grain; blocks still materialize exactly once and are reused).
    * Iterations are a fixed small count — convergence detection would
    * add a count job per round for little benefit at 3–10 rounds.
    * Retained-blocks footprint: with no per-round action and no
    * unpersist, every round's checkpointed blocks stay cached for the
    * lifetime of the final frame, so storage grows with `iters` ×
    * ranks-table size — bounded today by the small fixed round counts
    * (3–10) every caller uses; a caller looping to convergence at
    * cluster scale should unpersist the previous iterate once the next
    * round materializes (the loops that DO take a per-round action —
    * k-core, BFS, label-prop convergence counts — can do so safely).
    */
  def pageRankPpm(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      iters: Int = 3,
      dampPct: Int = 85
  ): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    // checkpoint the edge projection too: every iteration joins ranks
    // onto e AND outdeg re-derives from it — without the cut, the
    // caller's full edge lineage re-executes ~2× per round
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))
      .localCheckpoint(false)
    val basePpm = (100L - dampPct) * 10000L
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_ppm"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          expr("CAST(rank_ppm DIV __outdeg AS BIGINT)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__sum"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(basePpm) +
            expr(s"CAST(($dampPct * coalesce(__sum, 0L)) DIV 100 AS BIGINT)"))
            .as("rank_ppm"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** Personalized PageRank (Page et al. 1999 §6; Jeh & Widom 2002's
    * preference-set form) — [[pageRankPpm]] with the restart mass paid
    * ONLY to a SEED set: ranks answer "importance as seen FROM these
    * nodes" (a crawl frontier, a trusted-domain whitelist, a user's
    * home set) instead of global importance — the standard
    * seed-expansion primitive for curating a corpus around trusted
    * sources. Integer convention mirrors [[pageRankPpm]] exactly:
    * seeds start (and restart) at `(100−damp)·10⁴` ppm, non-seeds at
    * 0, per-edge contributions floored identically — so with seeds =
    * ALL nodes this IS the uniform operator (spec-pinned).
    *
    * Scale shape: identical to [[pageRankPpm]] — `iters` keyed
    * join+aggregate rounds over localCheckpointed edge/degree
    * projections. The seed flag rides ONE left join with NO forced
    * broadcast hint: a frontier-sized seed set broadcasts on the
    * planner's own size estimate (AQE re-plans at runtime), while a
    * corpus-sized seed set — legitimate, e.g. "every 83rd doc" — takes
    * a plain shuffle join instead of becoming a driver/executor memory
    * hazard.
    */
  def personalizedPageRankPpm(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      seeds: DataFrame,
      iters: Int = 3,
      dampPct: Int = 85
  ): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val sd = seeds.toDF("node").distinct()
    val flagged = nodes
      .join(sd.withColumn("__s", lit(1L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("__seed"))
      .localCheckpoint(false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))
      .localCheckpoint(false)
    val basePpm = (100L - dampPct) * 10000L
    var ranks = flagged
      .select(col("node"), (col("__seed") * 1000000L).as("rank_ppm"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          expr("CAST(rank_ppm DIV __outdeg AS BIGINT)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__sum"))
      ranks = flagged.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (col("__seed") * basePpm +
            expr(s"CAST(($dampPct * coalesce(__sum, 0L)) DIV 100 AS BIGINT)"))
            .as("rank_ppm"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** Per-node triangle counts via DEGREE-ORDERED edge orientation — the
    * compact-forward algorithm (Latapy 2008; Suri & Vassilvitskii's
    * MapReduce form): canonicalize to undirected distinct edges, orient
    * every edge from its lower-(degree, id) endpoint to the higher, and
    * count each triangle exactly once as a wedge (two out-edges of one
    * apex) closed by an oriented edge between the wedge tips.
    *
    * WHY the orientation is the whole scale story: out-degree under
    * degree order is O(√m) for ANY graph, so the wedge self-join
    * generates Σ outdeg² = O(m^1.5) candidates worst-case and a social
    * hub with 10⁷ neighbors contributes almost nothing as an apex
    * (its edges orient INTO it) — a naive neighbor self-join would
    * square the hub instead. Ties on degree break on node id, so the
    * orientation (and every count) is deterministic.
    *
    * Output: `(node, n_triangles)` for every node of ≥1 triangle — all
    * integer arithmetic, exact, oracle-checkable (`q148`).
    */
  def triangleCounts(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame = {
    val und = edges.select(srcCol.as("a"), dstCol.as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // total order for orientation: degree, then id — packed into one
    // BIGINT key (degree < 2³¹ and ids < 2³¹ for any graph whose edge
    // list fits this engine)
    val withK = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"),
        (col("du") * lit(1L << 31) + col("u")).as("ku"),
        (col("dv") * lit(1L << 31) + col("v")).as("kv"))
    // the oriented edge list feeds THREE consumers (both wedge sides and
    // the closing-edge probe) — checkpoint it so the canonicalize/degree
    // build runs once, not three times (plan audit measured 16 exchanges
    // without the cut, 3× the canonical shape)
    val oriented = withK.select(
        when(col("ku") < col("kv"), struct(col("u").as("x"), col("v").as("y"),
          col("kv").as("ky")))
          .otherwise(struct(col("v").as("x"), col("u").as("y"), col("ku").as("ky")))
          .as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"), col("e.ky").as("ky"))
      .localCheckpoint(false)
    // wedges: unordered pairs of out-neighbors of one apex, ordered by
    // the SAME key so the closing edge's oriented form is known
    val e1 = oriented.select(col("x"), col("y").as("p"), col("ky").as("kp"))
    val e2 = oriented.select(col("x"), col("y").as("q"), col("ky").as("kq"))
    val wedges = e1.join(e2, Seq("x")).filter(col("kp") < col("kq"))
    val triangles = wedges.join(
      oriented.select(col("x").as("p"), col("y").as("q")), Seq("p", "q"))
      .select(col("x"), col("p"), col("q"))
    triangles
      .select(explode(array(col("x"), col("p"), col("q"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Exact hop distance from a seed set, level-synchronous frontier BFS —
    * the link-graph reachability primitive (crawl-depth gating, seed-set
    * expansion for curation, influence radius). Returns `(node, dist)`
    * for every node within `maxHops` directed hops of a seed; a seed's
    * own distance is 0. Distances are exact by induction: round `i`
    * expands only the FRONTIER (nodes first discovered at distance
    * `i−1`), and a node joins the distance table the first round that
    * reaches it.
    *
    * Scale shape: the frontier join is the whole story — round `i` joins
    * |frontier_i| rows against the edge list (edges bucketed by src
    * co-locate it), NOT the full distance table, so total work is
    * O(Σ frontier out-edges) = O(m) over the whole run — the
    * textbook level-synchronous BFS dataflow (Pregel's per-superstep
    * message set). The anti-join that dedups rediscovered nodes keys on
    * the candidate set (≤ |frontier| × avg outdeg), and both the
    * distance table and frontier are lazily `localCheckpoint`ed per
    * round so the plan stays O(1) deep regardless of `maxHops` (the
    * [[pageRankPpm]] lineage-and-laziness contract).
    */
  def bfsLevels(
      edges: DataFrame,
      seeds: DataFrame,
      srcCol: Column,
      dstCol: Column,
      seedCol: Column,
      maxHops: Int
  ): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    var dist = seeds.select(seedCol.as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(false)
    var frontier = dist.select("node")
    for (i <- 1 to maxHops) {
      val candidates = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
      val discovered = candidates.join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(i.toLong).as("dist"))
        .localCheckpoint(false)
      dist = dist.union(discovered).localCheckpoint(false)
      frontier = discovered.select("node")
    }
    dist
  }

  /** In/out degree per node (nodes with zero of either still appear). */
  def degrees(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame = {
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"))
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Canonical undirected edge set: self-loops dropped, each edge once
    * as `(u, v)` with `u < v`. Shared by the pair-scoring operators. */
  private def undirected(edges: DataFrame, srcCol: Column, dstCol: Column): DataFrame =
    edges.select(srcCol.as("a"), dstCol.as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()

  /** Resource-Allocation link prediction (Zhou, Lü & Zhang 2009): for
    * every NON-adjacent pair `(a, b)` sharing at least one neighbor,
    * `RA(a,b) = Σ_{v ∈ Γ(a)∩Γ(b)} 1/deg(v)` — each common neighbor
    * spreads one unit of "resource" evenly over its neighborhood, so
    * low-degree common neighbors are strong evidence and hubs are
    * near-noise. The index is computed in exact integer ppm
    * (`1_000_000 DIV deg(v)`, summed), so results are bit-identical
    * across engines and partitionings.
    *
    * Scale shape: common-neighbor pairs are wedges — two adjacency
    * entries at one apex — and a hub apex of degree d generates d²
    * candidate pairs. The `maxApexDeg` cap excludes apexes with
    * deg > cap from SCORING (documented conservative drop, like the
    * LSH bucket caps): their per-pair weight is already < 1e6/cap
    * ≈ noise, and the cap bounds wedge volume at
    * Σ_{deg(v)≤c} deg(v)² ≤ c·2m = O(m) — linear in edges, never
    * quadratic in a hub. One wedge self-join keyed on the apex + one
    * anti-join against the edge set; both shuffle-partition on their
    * keys.
    *
    * Output: `(node_a, node_b, n_common, ra_ppm)` for non-adjacent
    * pairs with ≥1 (cap-eligible) common neighbor, `node_a < node_b`.
    */
  def resourceAllocationPpm(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      maxApexDeg: Int = 64
  ): DataFrame = {
    require(maxApexDeg >= 2, s"maxApexDeg must be >= 2: $maxApexDeg")
    // the undirected set feeds three consumers (adjacency both ways +
    // the final anti-join) — checkpoint so canonicalization runs once
    val und = undirected(edges, srcCol, dstCol).localCheckpoint(false)
    val adj = und.select(col("u").as("apex"), col("v").as("n"))
      .union(und.select(col("v").as("apex"), col("u").as("n")))
    val deg = adj.groupBy("apex").agg(count(lit(1)).as("d"))
    val eligible = adj.join(
        deg.filter(col("d") >= 2 && col("d") <= maxApexDeg), Seq("apex"))
      .withColumn("w_ppm", expr("CAST(1000000 DIV d AS BIGINT)"))
      .localCheckpoint(false)
    val l = eligible.select(col("apex"), col("n").as("node_a"), col("w_ppm"))
    val r = eligible.select(col("apex"), col("n").as("node_b"))
    val wedges = l.join(r, Seq("apex"))
      .filter(col("node_a") < col("node_b"))
      .groupBy("node_a", "node_b")
      .agg(count(lit(1)).as("n_common"), sum(col("w_ppm")).as("ra_ppm"))
    wedges.join(und,
        wedges("node_a") === und("u") && wedges("node_b") === und("v"),
        "left_anti")
  }

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert & Kumara 2007), made DETERMINISTIC: every node starts
    * labeled with its own id; each round every node simultaneously
    * adopts the label that is most frequent among its neighbors,
    * breaking frequency ties on the SMALLEST label (the classic
    * algorithm breaks ties randomly — this variant is a pure function
    * of the graph, so it bit-replays in any engine). Runs a FIXED
    * `rounds` count — the operator's contract is "the label state
    * after R synchronous rounds", not convergence (synchronous LPA can
    * 2-cycle on bipartite structures; a fixed horizon makes the output
    * well-defined and oracle-checkable).
    *
    * Scale shape per round: one join of the label table onto the
    * symmetric adjacency (keyed on the neighbor endpoint) + one
    * two-level aggregate (count per (node, label), then the
    * deterministic argmax via a min over (−count, label) structs —
    * only the count is negated, so node ids of ANY orderable type
    * (strings included) work; no window, no sort); labels are lazily
    * `localCheckpoint`ed per
    * round (the [[pageRankPpm]] lineage-and-laziness contract). Isolated nodes
    * never appear (the node set is the edge endpoints), matching the
    * published algorithm.
    *
    * Output: `(node, label)` after `rounds` rounds.
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      rounds: Int = 4
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val und = undirected(edges, srcCol, dstCol)
    val sym = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(false)
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy("node")
        // (count desc, label asc) argmax as ONE struct-min: negate the
        // COUNT (always numeric), never the label — so string-keyed
        // edge lists work identically to numeric ones
        .agg(min(struct((-col("__cnt")).as("__negcnt"), col("label")))
          .as("__best"))
        .select(col("node"), col("__best.label").as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** HITS hubs & authorities (Kleinberg 1999) on the DIRECTED edge
    * list, fixed `rounds` synchronous iterations in exact integer ppm —
    * the link-analysis companion to [[pageRankPpm]] that separates
    * "points at good pages" (hub) from "is pointed at by good hubs"
    * (authority), the curation signal for directory/spam-farm shapes a
    * single centrality conflates. Per round: `a(v) = Σ_{u→v} h(u)` then
    * `h(u) = Σ_{u→v} a(v)`, each side MAX-normalized to ppm with ONE
    * truncating floor per node (`ppm = raw·10⁶ DIV max(raw)` — the
    * integer-deterministic stand-in for the paper's L2 norm: same
    * ranking, bit-replayable; products run in DECIMAL(38,0) so degree
    * × 10⁶ cannot wrap). Self-loops and duplicate edges are dropped
    * (canonicalization, the [[triangleCounts]] precedent); a fixed
    * horizon, not convergence, defines the output (the
    * [[labelPropagation]] contract).
    *
    * Scale shape per round: two keyed join+aggregate passes over the
    * edge list plus a ONE-ROW max broadcast per side; scores are
    * lazily `localCheckpoint`ed (the [[pageRankPpm]] lineage-and-
    * laziness contract). Nothing all-pairs, nothing row².
    *
    * Output: `(node, hub_ppm, auth_ppm)` after `rounds` rounds; nodes
    * with no out-edges (in-edges) score 0 on the hub (authority) side.
    */
  def hits(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      rounds: Int = 4
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.filter(srcCol.isNotNull && dstCol.isNotNull)
      .select(srcCol.as("src"), dstCol.as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    def normalize(raw: DataFrame): DataFrame = {
      val mx = raw.agg(max(col("__raw")).as("__mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          when(col("__mx") > 0, expr(
            "CAST((CAST(coalesce(__raw, CAST(0 AS BIGINT)) AS DECIMAL(38,0))" +
              " * 1000000) DIV __mx AS BIGINT)"))
            .otherwise(lit(0L)).as("ppm"))
        .localCheckpoint(false)
    }
    var hub = nodes.select(col("node"), lit(1000000L).as("ppm"))
      .localCheckpoint(false)
    var auth = hub
    for (_ <- 1 to rounds) {
      auth = normalize(e
        .join(hub.select(col("node").as("src"), col("ppm").as("__h")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__h")).as("__raw")))
      hub = normalize(e
        .join(auth.select(col("node").as("dst"), col("ppm").as("__a")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("__a")).as("__raw")))
    }
    nodes
      .join(hub.select(col("node"), col("ppm").as("hub_ppm")), Seq("node"))
      .join(auth.select(col("node"), col("ppm").as("auth_ppm")), Seq("node"))
      .select(col("node"), col("hub_ppm"), col("auth_ppm"))
  }

  /** Newman modularity of a community partition in exact integer ppm
    * (Newman & Girvan 2004) — the "was that clustering any good"
    * readout for [[labelPropagation]]'s output (or any (node, label)
    * table): per community `c` with `e_c` internal edges and `d_c`
    * summed member degrees over an undirected graph of `m` edges,
    * `Q = Σ_c (e_c/m − (d_c/2m)²) = Σ_c (4m·e_c − d_c²) / (4m²)`.
    * Each community's contribution floors ONCE
    * (`(4m·e_c − d_c²)·10⁶ DIV 4m²`, DECIMAL(38,0) lanes — 4m²
    * passes BIGINT beyond m ≈ 1.5·10⁹ edges), so the per-community
    * rows are the decomposition and their exact sum is the partition's
    * Q up to one floor per community — deterministic in any engine.
    * Nodes missing from `labels` contribute degree to no community
    * (their edges can still be internal to nothing) — feed a TOTAL
    * assignment for textbook Q.
    *
    * Scale shape: canonicalize + two label joins + two hash aggregates
    * — all keyed on node/community, nothing pairwise.
    *
    * Output per community: `label`, `n_nodes`, `e_in`, `deg_sum`,
    * `q_contrib_ppm` (can be negative — a community worse than random).
    */
  def modularityPpm(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      labels: DataFrame
  ): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    val und = undirected(edges, srcCol, dstCol).localCheckpoint(false)
    val lab = labels.select(col("node"), col("label")).localCheckpoint(false)
    val withLabs = und
      .join(lab.select(col("node").as("u"), col("label").as("__lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("__lv")), Seq("v"))
    val eIn = withLabs.filter(col("__lu") === col("__lv"))
      .groupBy(col("__lu").as("label"))
      .agg(count(lit(1)).as("e_in"))
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("__d"))
    val dSum = lab.join(deg, Seq("node"), "left")
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("__d"), lit(0L))).as("deg_sum"))
    val m = und.agg(count(lit(1)).as("__m"))
    dSum.join(eIn, Seq("label"), "left")
      .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
      .crossJoin(broadcast(m))
      .withColumn("q_contrib_ppm", expr(
        s"""CAST(CASE WHEN __m > 0 THEN
           |  ((4 * CAST(__m AS $d38) * e_in - CAST(deg_sum AS $d38) * deg_sum)
           |    * 1000000)
           |  DIV (4 * CAST(__m AS $d38) * __m) END AS BIGINT)""".stripMargin))
      .select(col("label"), col("n_nodes"), col("e_in"), col("deg_sum"),
        col("q_contrib_ppm"))
  }

  /** Degree assortativity in signed r²-ppm (Newman 2002) — do hubs
    * link to hubs? Pearson correlation of endpoint degrees over the
    * SYMMETRIZED undirected edge list (each edge contributes both
    * orientations, the published convention — without it r is
    * direction-biased), reported as the [[graft.ops.Stats]] spearman
    * convention `sign(cov)·(cov²·10⁶) DIV (vx·vy)` — no sqrt, exact
    * integers in DECIMAL(38,0) lanes with the explicit magnitude guard
    * `n²·max_dx·max_dy ≤ 3·10¹⁷` (NULL beyond — pre-bucket degrees
    * past that scale). NULL when degrees are constant (zero variance).
    * Social graphs: positive; web/biology: typically negative — the
    * one-row fingerprint that decides hub-salting strategy before a
    * graph job.
    *
    * Scale shape: one degree aggregate + two broadcast-joins of the
    * degree table onto the edge list + ONE global aggregate (the
    * groupBy().count() profile).
    *
    * Output (one row): `n_ends` (2m), `r2_signed_ppm`.
    */
  def degreeAssortativityPpm(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column
  ): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    val und = undirected(edges, srcCol, dstCol)
    val sym = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(false)
    val deg = sym.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("d"))
    sym
      .join(deg.select(col("node").as("a"), col("d").as("__x")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("__y")), Seq("b"))
      .agg(count(lit(1)).as("n_ends"),
        sum(expr(s"CAST(__x AS $d38)")).as("__sx"),
        sum(expr(s"CAST(__y AS $d38)")).as("__sy"),
        sum(expr(s"CAST(__x AS $d38) * __x")).as("__qx"),
        sum(expr(s"CAST(__y AS $d38) * __y")).as("__qy"),
        sum(expr(s"CAST(__x AS $d38) * __y")).as("__qxy"),
        max(col("__x")).as("__mx"), max(col("__y")).as("__my"))
      .withColumn("__cov", expr("n_ends * __qxy - __sx * __sy"))
      .withColumn("__vx", expr("n_ends * __qx - __sx * __sx"))
      .withColumn("__vy", expr("n_ends * __qy - __sy * __sy"))
      .withColumn("__ok", expr(
        s"CAST(n_ends AS $d38) * n_ends * __mx * __my" +
          s" <= CAST(300000000000000000 AS $d38)"))
      .withColumn("r2_signed_ppm",
        when(col("__ok") && col("__vx") > 0 && col("__vy") > 0, expr(
          """CAST((CASE WHEN __cov < 0 THEN -1 ELSE 1 END)
            |  * (((__cov * __cov * 1000) DIV (__vx * __vy)) * 1000
            |     + (((__cov * __cov * 1000) % (__vx * __vy)) * 1000)
            |       DIV (__vx * __vy)) AS BIGINT)""".stripMargin)))
      .select(col("n_ends"), col("r2_signed_ppm"))
  }

  /** k-core decomposition by iterative peel (Seidman 1983; the
    * Matula–Beck algorithm's bulk-synchronous form): repeatedly delete
    * every node of degree < k until the fixpoint — what survives is
    * the maximal subgraph where every node has ≥ k neighbors, the
    * standard cohesion filter for link-graph curation (a page kept by
    * the 3-core has 3 independent neighbors that also survived, a far
    * stronger prior than raw degree).
    *
    * Each round is one degree aggregate + two semi-joins that restrict
    * the symmetric adjacency to surviving endpoints — all keyed
    * shuffles, no all-pairs anywhere; adjacency is lazily
    * `localCheckpoint`ed per round so the plan stays O(1) deep (the
    * [[pageRankPpm]] lineage-and-laziness contract; the per-round
    * fixpoint count is the job that materializes the round). The loop exits as soon as a
    * round deletes nothing (the fixpoint — one driver-side count per
    * round, the same bounded-rounds pattern as
    * `Dedup.clusterLabelsLargeSmallStar`) or after `maxRounds`, so a
    * replayed engine that unrolls exactly `maxRounds` rounds computes
    * the identical result: post-fixpoint rounds are no-ops.
    *
    * Output: `(node, core_deg)` — every member of the k-core (after
    * `maxRounds` rounds) with its degree INSIDE the core.
    */
  def kCore(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      k: Int,
      maxRounds: Int = 8
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val und = undirected(edges, srcCol, dstCol)
    var sym = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(false)
    var n = sym.count()
    var round = 0
    var stable = false
    while (round < maxRounds && !stable && n > 0) {
      val keep = sym.groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select("node")
      sym = sym
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint(false)
      val n2 = sym.count()
      stable = n2 == n
      n = n2
      round += 1
    }
    sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_deg"))
  }
}
