package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MarketBasketSpec extends SparkTestBase {
  import spark.implicits._

  test("pairRules: exact counts, ppm scores, presence-not-multiplicity") {
    val rows = Seq(
      // basket 1: {a, b, c}; basket 2: {a, b}; basket 3: {a} (b twice in
      // basket 1 must collapse to presence); basket 4: {c}
      (1L, "a"), (1L, "b"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "c")
    ).toDF("b", "item")
    val got = MarketBasket.pairRules(rows, col("b"), col("item"), minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    // (a,b): together in 2 of 4 baskets; n_a=3, n_b=2
    assert(got(("a", "b")) == ((2L, 3L, 2L, 500000L, 666666L, 1000000L)))
    // (a,c) and (b,c): together once
    assert(got(("a", "c")) == ((1L, 3L, 2L, 250000L, 333333L, 500000L)))
    assert(got(("b", "c")) == ((1L, 2L, 2L, 250000L, 500000L, 500000L)))
    assert(got.size == 3)
  }

  test("pairRules: minPairCount prunes; NULL baskets/items excluded") {
    val rows = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), Some("a")), (Some(2L), Some("b")),
      (Some(3L), Some("a")), (Some(3L), Some("c")),
      (None, Some("a")), (Some(9L), None)
    ).toDF("b", "item")
    val got = MarketBasket.pairRules(rows, col("b"), col("item"), minPairCount = 2L)
      .select("item_a", "item_b", "n_ab", "support_ppm")
      .as[(String, String, Long, Long)].collect()
    // only (a,b) survives the 2-basket floor; 3 valid baskets total
    assert(got.toList == List(("a", "b", 2L, 666666L)))
  }

  test("pairRules: maxBasketSize excludes a pathological basket wholesale") {
    val rows = (
      // basket 99 is the bot basket: 10 items -> C(10,2)=45 pairs uncapped
      (1 to 10).map(i => (99L, s"i$i")) ++
        Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    ).toDF("b", "item")
    val capped = MarketBasket.pairRules(rows, col("b"), col("item"),
      minPairCount = 1L, maxBasketSize = Some(5))
    val got = capped.select("item_a", "item_b", "n_ab", "n_a", "n_b", "support_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toList
    // the bot basket vanishes from pairs AND marginals AND the total:
    // 2 surviving baskets, (a,b) in both -> support 10^6
    assert(got == List(("a", "b", 2L, 2L, 2L, 1000000L)), s"got $got")
    // default cap=∞ is unchanged behavior: the 45 bot pairs all appear
    val uncapped = MarketBasket.pairRules(rows, col("b"), col("item"),
      minPairCount = 1L)
    assert(uncapped.count() == 45L + 1L)
  }
}
