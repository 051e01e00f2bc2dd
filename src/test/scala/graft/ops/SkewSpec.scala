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
}
