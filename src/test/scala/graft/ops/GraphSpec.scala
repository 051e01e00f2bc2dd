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

  test("degrees counts both directions with zero-fill") {
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val m = Graph.degrees(e, col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m == Map(0L -> (2L, 0L), 1L -> (1L, 1L), 2L -> (0L, 2L)))
  }
}
