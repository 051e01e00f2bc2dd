package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  private def skewed = ((1 to 1000).map(_ => ("hot", 1L)) ++
    (1 to 10).map(i => (s"cold$i", 2L))).toDF("k", "v")

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("k").count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, Seq("k")).as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedSum equals plain groupBy sum") {
    val plain = skewed.groupBy("k").agg(sum("v")).as[(String, Long)].collect().toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), col("v")).as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("AQE splits a skewed sort-merge join at runtime (the 100 TB skew story)") {
    // Shrink AQE's skew thresholds so the fixture-sized skew triggers the
    // same OptimizeSkewedJoin path a production hot key would.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0")
    val previous = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val payload = "x" * 100
      val left = ((1 to 20000).map(_ => ("hot", payload)) ++
        (1 to 200).map(i => (s"cold$i", payload))).toDF("k", "pay")
      val right = (Seq("hot") ++ (1 to 200).map(i => s"cold$i"))
        .map(k => (k, k.length.toLong)).toDF("k", "klen")
      val joined = left.join(right, "k")
      // collect() (not count()) — count() builds a NEW plan; the skew
      // markers only appear on the plan instance that actually ran
      assert(joined.collect().length == 20200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition for skew split:\n${plan.take(1200)}")
    } finally {
      previous.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("saltedDistinct equals plain count(DISTINCT), including NULL keys and values") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = Seq(
      (Some("hot"), Some(1L)), (Some("hot"), Some(2L)), (Some("hot"), Some(2L)),
      (Some("hot"), Some(3L)), (Some("hot"), None),
      (Some("cold"), Some(1L)),
      (Some("empty"), None),            // all-NULL values -> 0, key KEPT
      (None, Some(9L)), (None, Some(9L)) // NULL key is its own group
    ).toDF("k", "v")
    val salted = Skew.saltedDistinct(rows, Seq("k"), col("v"), saltBuckets = 4)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val plain = rows.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(salted == plain, s"salted $salted vs plain $plain")
    assert(salted == Map(Some("hot") -> 3L, Some("cold") -> 1L,
      Some("empty") -> 0L, None -> 1L))
    // larger randomized-ish domain: every bucket count must still be exact
    val big = (0 until 5000).map(i => (s"k${i % 7}", (i * 13 % 997).toLong))
      .toDF("k", "v")
    val s2 = Skew.saltedDistinct(big, Seq("k"), col("v"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val p2 = big.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s2 == p2)
  }
}
