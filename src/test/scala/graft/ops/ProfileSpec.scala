package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: null counts, exact distincts, min/max per column in long form") {
    val df = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(-5L)),
      (4L, None, Some(10L))
    ).toDF("id", "s", "v")
    val rows = Profile.profile(df, Seq(
      "id" -> col("id"), "s" -> col("s"), "v" -> col("v")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(rows("id") == ((4L, 0L, 4L, "1", "4")))
    assert(rows("s") == ((4L, 1L, 2L, "a", "b")))
    assert(rows("v") == ((4L, 1L, 2L, "-5", "10")))
  }

  test("profile: an all-NULL column reports NULL min/max and 0 distincts") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val r = Profile.profile(df, Seq("s" -> col("s"))).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("profile: single aggregate job — the multi-distinct plans as one Expand") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id" -> col("id"), "s" -> col("s")))
      .queryExecution.executedPlan.toString
    // one Expand for the N distinct aggregates, not N separate jobs/unions
    assert(plan.split("Expand").length - 1 == 1, s"expected exactly 1 Expand:\n$plan")
    assert(!plan.contains("Union"), s"expected no per-column union:\n$plan")
  }
}
