package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom semi join equals the plain semi join (false positives removed)") {
    val left = spark.range(0, 10000).toDF("k")
    val right = spark.range(0, 10000).filter(col("id") % 97 === 0).toDF("rk")
    val got = BloomJoin.semiJoin(left, "k", right, "rk", expectedItems = 128, fpp = 0.1)
      .orderBy("k").as[Long].collect()
    val want = left.join(right, col("k") === col("rk"), "left_semi")
      .orderBy("k").as[Long].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("pre-filter prunes: surviving probe rows are a superset of matches, bounded by fpp") {
    val left = spark.range(0, 20000).toDF("k")
    val right = spark.range(0, 20000).filter(col("id") % 100 === 0).toDF("rk")
    val bloom = right.stat.bloomFilter("rk", 200, 0.03)
    val survivors = left.collect().map(_.getLong(0)).count(bloom.mightContainLong)
    // 200 true keys; false positives ~3% of the other 19800 — the filter
    // must remove the overwhelming bulk of the probe side before the join
    assert(survivors >= 200)
    assert(survivors < 2200, s"bloom pruned too little: $survivors of 20000 survive")
  }
}
