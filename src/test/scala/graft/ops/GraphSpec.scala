package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRankPpm: a symmetric cycle is a fixpoint at exactly 1,000,000 ppm") {
    // a->b->c->a, outdeg 1 everywhere: each round computes
    // 150000 + (85 * 1000000) // 100 = 1000000 again
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val got = Graph.pageRankPpm(e, col("src"), col("dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRankPpm: source decays to base mass, sink accumulates then decays") {
    // a->b, b dangling. Round 1: a = 150000 (no in-links),
    // b = 150000 + 850000 = 1000000. Round 2: b = 150000 + 85*150000//100
    // = 277500. Round 3: b = 277500 (a stays 150000).
    val e = Seq((0L, 1L)).toDF("src", "dst")
    val r2 = Graph.pageRankPpm(e, col("src"), col("dst"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(0L -> 150000L, 1L -> 277500L))
    val r1 = Graph.pageRankPpm(e, col("src"), col("dst"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 150000L, 1L -> 1000000L))
  }

  test("pageRankPpm: floor division applied per edge, multi-edges each contribute") {
    // a has TWO edges to b (kept as multi-edges): outdeg 2, each carries
    // 1000000 // 2, so b's round-1 in-sum is 1000000 exactly
    val e = Seq((0L, 1L), (0L, 1L), (2L, 0L)).toDF("src", "dst")
    val got = Graph.pageRankPpm(e, col("src"), col("dst"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 150000L + 850000L)
  }

  test("personalizedPageRankPpm: hand-computed seed restart; all-seeds = uniform") {
    // a->b->c->a cycle, seed {0}. r0 = (1e6, 0, 0).
    // round 1: a = 150000 + 0 (in from c=0), b = 0 + 85*1e6//100 = 850000,
    //          c = 0. round 2: a = 150000, b = 85*150000//100 = 127500,
    //          c = 85*850000//100 = 722500.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val r2 = Graph.personalizedPageRankPpm(e, col("src"), col("dst"),
        seeds, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(0L -> 150000L, 1L -> 127500L, 2L -> 722500L), s"$r2")
    // seeds = ALL nodes degenerates to the uniform operator exactly
    val all = Seq(0L, 1L, 2L, 3L).toDF("node")
    val e2 = Seq((0L, 1L), (0L, 1L), (2L, 0L), (1L, 3L)).toDF("src", "dst")
    val ppr = Graph.personalizedPageRankPpm(e2, col("src"), col("dst"),
        all, iters = 3)
      .as[(Long, Long)].collect().toSeq.sorted
    val uni = Graph.pageRankPpm(e2, col("src"), col("dst"), iters = 3)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(ppr == uni)
  }

  test("degrees counts both directions with zero-fill") {
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val m = Graph.degrees(e, col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map(0L -> (2L, 0L), 1L -> (1L, 1L), 2L -> (0L, 2L)))
  }

  test("triangleCounts: K4 = 3 per node; direction/dup/self-loop noise ignored; paths 0") {
    // K4 on 0-3 with adversarial encoding: some edges doubled, some
    // reversed, a self-loop — canonicalization must erase all of it
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    val noisy = (k4 ++ k4.take(3).map(_.swap) ++ Seq((2L, 2L))) ++
      Seq((10L, 11L), (11L, 12L)) // a path: no triangles
    val m = Graph.triangleCounts(noisy.toDF("src", "dst"), col("src"), col("dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 has C(4,3)=4 triangles; each node sits in exactly 3
    assert(m == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $m")
  }

  test("triangleCounts: a hub apex contributes wedges only via its two low-degree tips") {
    // star 0-{1..6} plus one rim edge (1,2): exactly ONE triangle
    val e = ((1L to 6L).map(i => (0L, i)) :+ (1L, 2L)).toDF("src", "dst")
    val m = Graph.triangleCounts(e, col("src"), col("dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"got $m")
  }

  test("bfsLevels: exact hop distances on a chain with a shortcut") {
    // 0→1→2→3→4 plus shortcut 0→3: dist(3) must be 1 (shortcut wins),
    // dist(4)=2 through it; 5 is unreachable and must be absent
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (5L, 0L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val m = Graph.bfsLevels(e, seeds, col("src"), col("dst"), col("node"), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L), s"got $m")
  }

  test("bfsLevels: maxHops truncates; a node first reached later is absent") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val m = Graph.bfsLevels(e, seeds, col("src"), col("dst"), col("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 2L), s"got $m")
  }

  test("bfsLevels: multi-seed takes the minimum over seeds; self-loops ignored") {
    val e = Seq((0L, 1L), (1L, 2L), (9L, 2L), (2L, 2L)).toDF("src", "dst")
    val seeds = Seq(0L, 9L, 9L).toDF("node") // duplicate seed collapses
    val m = Graph.bfsLevels(e, seeds, col("src"), col("dst"), col("node"), maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 9L -> 0L, 1L -> 1L, 2L -> 1L), s"got $m")
  }

  test("resourceAllocationPpm: hand-scored star+edge, adjacent pairs excluded") {
    // star 0-{1,2,3} plus edge 1-2. deg: 0->3, 1->2, 2->2, 3->1.
    // apexes with deg in [2,64]: 0 (w=333333), 1 (w=500000), 2 (w=500000).
    // wedges at 0: (1,2) (1,3) (2,3); at 1: (0,2); at 2: (0,1).
    // adjacent pairs (0,1) (0,2) (0,3) (1,2) drop -> only (1,3) and (2,3)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.resourceAllocationPpm(e, col("src"), col("dst"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L, 333333L), (2L, 3L, 1L, 333333L)), s"got $got")
  }

  test("resourceAllocationPpm: the apex degree cap excludes hub wedges") {
    // same graph, cap 2: node 0 (deg 3) no longer scores, and the
    // remaining wedges at 1 and 2 only propose already-adjacent pairs
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.resourceAllocationPpm(e, col("src"), col("dst"),
      maxApexDeg = 2).count()
    assert(got == 0L)
  }

  test("resourceAllocationPpm: direction and duplicate edges are canonicalized") {
    // the same star encoded with reversed + doubled edges scores identically
    val e = Seq((1L, 0L), (0L, 2L), (2L, 0L), (3L, 0L), (2L, 1L))
      .toDF("src", "dst")
    val got = Graph.resourceAllocationPpm(e, col("src"), col("dst"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L, 333333L), (2L, 3L, 1L, 333333L)))
  }

  test("kCore: K4 plus a tail — the tail peels, the clique survives with core degrees") {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.kCore(e, col("src"), col("dst"), k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $got")
  }

  test("kCore: a peel CASCADE removes the chain one round at a time") {
    // triangle 0-1-2 plus path 2-3-4: round 1 drops 4 (deg 1), which
    // only THEN exposes 3 (deg falls 2 -> 1) — a genuine fixpoint loop
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.kCore(e, col("src"), col("dst"), k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 2L), s"got $got")
  }

  test("labelPropagation: two cliques joined by a bridge settle into two communities") {
    // K3 {0,1,2} - bridge 2-3 - K3 {3,4,5}: round 1 pulls every node to
    // its clique's min id; the bridge endpoints see a frequency tie and
    // take the SMALLEST label
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, col("src"), col("dst"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    val communities = got.groupBy(_._2).values.map(_.keys.toSet).toSet
    // deterministic outcome: the left clique's 0-label wins the bridge
    // and floods; assert the STRUCTURE (labels partition the nodes) and
    // determinism rather than one blessed flood pattern
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(communities.forall(_.nonEmpty))
    val again = Graph.labelPropagation(e, col("src"), col("dst"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == again)
  }

  test("labelPropagation: one round on a star adopts the hub/leaf majority exactly") {
    // star 0-{1,2,3}: after ONE synchronous round the hub sees labels
    // {1,2,3} (tie) -> min 1; each leaf sees only {0} -> 0
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, col("src"), col("dst"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L), s"got $got")
  }

  test("labelPropagation: string node ids work, mirroring the numeric result") {
    // the one-round star case with string keys: the tie-break argmax
    // negates the COUNT, not the label, so any orderable id type works
    // and ties still take the lexicographically smallest label
    val e = Seq(("n0", "n1"), ("n0", "n2"), ("n0", "n3")).toDF("src", "dst")
    val got = Graph.labelPropagation(e, col("src"), col("dst"), rounds = 1)
      .as[(String, String)].collect().toMap
    assert(got == Map("n0" -> "n1", "n1" -> "n0", "n2" -> "n0", "n3" -> "n0"),
      s"got $got")
  }

  test("hits: hand chain — hub/authority separate; dup edges and self-loops dropped") {
    // 1->3, 2->3, 3->4 (plus a duplicate 1->3 and a self-loop 2->2,
    // both canonicalized away). Four max-normalized ppm rounds:
    // auth: 3 = 1e6 every round, 4 halves each round (5e5, 2.5e5,
    // 1.25e5, 62500); hub: 1 = 2 = 1e6, 3 follows 4's auth one step
    // behind (ends 62500), 4 has no out-edges -> 0
    val e = Seq((1L, 3L), (1L, 3L), (2L, 2L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.hits(e, col("src"), col("dst"), rounds = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((1000000L, 0L)), 2L -> ((1000000L, 0L)),
      3L -> ((62500L, 1000000L)), 4L -> ((0L, 62500L))), s"got $got")
  }

  test("hits: empty edges stay empty with schema; a lone cycle saturates both sides") {
    val empty = Graph.hits(Seq.empty[(Long, Long)].toDF("src", "dst"),
      col("src"), col("dst"))
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("node", "hub_ppm", "auth_ppm"))
    // 1->2->1: perfectly symmetric, every score pins at the max -> 1e6
    val cyc = Graph.hits(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
        col("src"), col("dst"))
      .as[(Long, Long, Long)].collect().toSet
    assert(cyc == Set((1L, 1000000L, 1000000L), (2L, 1000000L, 1000000L)),
      s"got $cyc")
  }

  test("modularityPpm: two-clique hand case — exact per-community contributions") {
    // two triangles + bridge (m=7), communities {0,1,2} / {3,4,5}:
    // e_c=3, d_c=7 each -> contrib = (4*7*3 - 49)*1e6 DIV 196 = 178571
    // per community (Q = 2*0.178571 = 0.357, the textbook value)
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L)).toDF("src", "dst")
    val labels = Seq((0L, "A"), (1L, "A"), (2L, "A"),
      (3L, "B"), (4L, "B"), (5L, "B")).toDF("node", "label")
    val got = Graph.modularityPpm(e, col("src"), col("dst"), labels)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map("A" -> ((3L, 3L, 7L, 178571L)),
      "B" -> ((3L, 3L, 7L, 178571L))), s"got $got")
    // everything in ONE community: e_in = m, deg_sum = 2m -> Q = 0
    val one = Seq((0L, "X"), (1L, "X"), (2L, "X"), (3L, "X"), (4L, "X"),
      (5L, "X")).toDF("node", "label")
    val flat = Graph.modularityPpm(e, col("src"), col("dst"), one)
      .collect().head
    assert(flat.getLong(4) == 0L, s"got $flat")
  }

  test("degreeAssortativityPpm: a star is perfectly disassortative; constant degree is NULL") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.degreeAssortativityPpm(star, col("src"), col("dst"))
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == -1000000L, s"got $r")
    // a cycle: every degree 2, zero variance -> undefined, not 0
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val c = Graph.degreeAssortativityPpm(cyc, col("src"), col("dst"))
      .collect().head
    assert(c.getLong(0) == 6L && c.isNullAt(1), s"got $c")
  }

  test("kCore: k above the max degree empties; empty input stays empty with schema") {
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.kCore(e, col("src"), col("dst"), k = 5)
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("node", "core_deg"))
    val empty = Graph.kCore(e.limit(0), col("src"), col("dst"), k = 2)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("node", "core_deg"))
  }
}
