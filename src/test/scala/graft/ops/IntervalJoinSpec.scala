package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random fixtures (LCG on the row index — no
  // Math.random, stable across runs)
  private def points: DataFrame = spark.range(0, 400)
    .select(col("id").as("pid"), ((col("id") * 2654435761L) % 10000L).as("p_sec"))

  private def intervals: DataFrame = spark.range(0, 60)
    .select(col("id").as("iid"),
      ((col("id") * 40503L) % 9500L).as("i_start"))
    // spans from 1 s to ~1200 s — intervals overlap each other heavily
    .withColumn("i_end", col("i_start") + (col("iid") * 97L % 1200L) + 1L)

  private def naivePoint: Set[(Long, Long)] =
    points.join(intervals,
        col("p_sec") >= col("i_start") && col("p_sec") < col("i_end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("binnedPointJoin matches the naive range join exactly, each pair once, across bin sizes") {
    val expected = naivePoint
    assert(expected.nonEmpty)
    for (bin <- Seq(1L, 7L, 100L, 3600L, 100000L)) {
      val got = IntervalJoin.binnedPointJoin(
          points, "p_sec", intervals, "i_start", "i_end", bin)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bin=$bin emitted duplicates")
      assert(got.toSet == expected, s"bin=$bin diverges from naive join")
    }
  }

  test("binnedOverlapJoin matches the naive overlap join exactly, each pair once, across bin sizes") {
    val l = intervals.select(col("iid").as("aid"),
      col("i_start").as("a_start"), col("i_end").as("a_end"))
    val r = intervals.select(col("iid").as("bid"),
      (col("i_start") + 311L).as("b_start"), (col("i_end") + 555L).as("b_end"))
    val expected = l.join(r,
        col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    for (bin <- Seq(1L, 13L, 256L, 5000L)) {
      val got = IntervalJoin.binnedOverlapJoin(
          l, "a_start", "a_end", r, "b_start", "b_end", bin)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bin=$bin emitted duplicates")
      assert(got.toSet == expected, s"bin=$bin diverges from naive join")
    }
  }

  test("half-open semantics: endpoint point excluded, touching intervals do not overlap") {
    val p = Seq((1L, 100L), (2L, 200L)).toDF("pid", "p_sec")
    val i = Seq((10L, 100L, 200L)).toDF("iid", "i_start", "i_end")
    val hits = IntervalJoin.binnedPointJoin(p, "p_sec", i, "i_start", "i_end", 50L)
      .select("pid").as[Long].collect().toSet
    assert(hits == Set(1L)) // start inclusive, end exclusive

    val a = Seq((1L, 0L, 100L)).toDF("aid", "a_start", "a_end")
    val b = Seq((2L, 100L, 200L)).toDF("bid", "b_start", "b_end")
    assert(IntervalJoin.binnedOverlapJoin(
      a, "a_start", "a_end", b, "b_start", "b_end", 30L).count() == 0)
  }

  test("plan is an equi join on the bin id, never a nested loop, even with broadcast disabled") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val previous = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      val df = IntervalJoin.binnedPointJoin(
        points, "p_sec", intervals, "i_start", "i_end", 900L)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(2000))
    } finally previous match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("empty and degenerate intervals produce no matches") {
    val p = Seq((1L, 50L)).toDF("pid", "p_sec")
    val i = Seq((10L, 60L, 60L), (11L, 70L, 60L)).toDF("iid", "i_start", "i_end")
    assert(IntervalJoin.binnedPointJoin(p, "p_sec", i, "i_start", "i_end", 10L)
      .count() == 0)
  }
}
