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
}
