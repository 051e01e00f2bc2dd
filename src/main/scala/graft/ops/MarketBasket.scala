package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-pair association mining (the market-basket classic): which
  * items co-occur in the same basket more than independence predicts —
  * co-purchase analysis, co-occurring error codes, tag affinity. The
  * 2-itemset core of Apriori, which is the stage that dominates real
  * runs (longer itemsets prune exponentially from it).
  *
  * All scores are integer ppm over exact basket counts (support and
  * both conditional confidences — lift is `conf_ab/support(b)`,
  * derivable, and would overflow BIGINT at corpus scale), so results
  * are engine-portable and oracle-checkable.
  *
  * Scale shape: the basket–item table is deduplicated ONCE and
  * checkpointed for its three consumers (basket total, item marginals,
  * pair join). Pairs come from a self-join co-partitioned on the
  * basket key — one shuffle each side, and the candidate blow-up is
  * bounded by construction at C(items-per-basket, 2), the number of
  * true pairs (a per-basket `collect_set` + explode would be the same
  * count with a skew-fragile array). Item marginals and the one-row
  * basket total broadcast onto the pair counts.
  */
object MarketBasket {

  /** Pair rules over `(basket, item)` rows. Output per unordered item
    * pair (a < b): exact basket counts (`n_ab`, `n_a`, `n_b`),
    * `support_ppm = n_ab·10⁶ div n_baskets`,
    * `conf_ab_ppm = n_ab·10⁶ div n_a` (a ⇒ b),
    * `conf_ba_ppm = n_ab·10⁶ div n_b` (b ⇒ a).
    * Duplicate (basket, item) rows collapse first (presence, not
    * multiplicity — standard basket semantics); NULL baskets/items are
    * excluded; pairs below `minPairCount` baskets are pruned before
    * the marginal joins.
    *
    * `maxBasketSize`: the pair join is C(items-per-basket, 2), bounded
    * for real basket domains but QUADRATIC on one pathological hot
    * basket (bot traffic, a default/null-like basket key). A cap
    * excludes oversized baskets WHOLESALE — from pairs, marginals and
    * the basket total alike, as if filtered upstream — keeping the
    * counts mutually consistent and the exclusion deterministic
    * (capping to a subset of items would make support depend on an
    * arbitrary item choice). Same guard convention as the dedup
    * family's capped LSH buckets (`Dedup.bandedPairs`).
    */
  def pairRules(
      rows: DataFrame,
      basketCol: Column,
      itemCol: Column,
      minPairCount: Long = 2L,
      maxBasketSize: Option[Int] = None
  ): DataFrame = {
    val deduped = rows.select(basketCol.as("b"), itemCol.as("item"))
      .filter(col("b").isNotNull && col("item").isNotNull)
      .distinct()
    // basket-size guard via a window count: one shuffle on the basket
    // key, the same key the pair self-join needs anyway
    val sized = maxBasketSize.fold(deduped) { cap =>
      deduped
        .withColumn("__bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
        .filter(col("__bn") <= cap)
        .drop("__bn")
    }
    val bi = sized.localCheckpoint(false)
    val total = bi.agg(count_distinct(col("b")).as("__n_baskets"))
    val marginals = bi.groupBy("item").agg(count(lit(1)).as("__n"))
    val pairs = bi.toDF("b", "ia").join(bi.toDF("b", "ib"), Seq("b"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia").as("item_a"), col("ib").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(marginals.select(col("item").as("item_a"), col("__n").as("n_a")), Seq("item_a"))
      .join(marginals.select(col("item").as("item_b"), col("__n").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(n_ab * 1000000) DIV __n_baskets").as("support_ppm"),
        expr("(n_ab * 1000000) DIV n_a").as("conf_ab_ppm"),
        expr("(n_ab * 1000000) DIV n_b").as("conf_ba_ppm"))
  }
}
