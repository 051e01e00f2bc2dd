package graft.ops

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 12:00:00")),
    (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
    (4L, 20L, ts("2024-01-01 10:30:00"))
  ).toDF("event_id", "user_id", "ts")

  private def right = Seq(
    (100L, 10L, ts("2024-01-01 09:30:00")),
    (101L, 10L, ts("2024-01-01 11:00:00")),
    (102L, 10L, ts("2024-01-01 12:00:00")), // exact tie with event 2
    (200L, 20L, ts("2024-01-01 10:00:00"))
  ).toDF("o_orderkey", "o_custkey", "o_orderdate")

  test("backward as-of: latest right row at or before left time; <= on ties; null when none") {
    val out = AsOfJoin.backwardSelect(left, right,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate", pick = "o_orderkey")
      .select("event_id", "o_orderkey")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L) == Some(100L)) // 09:30 is latest <= 10:00
    assert(out(2L) == Some(102L)) // exact timestamp tie joins (<=)
    assert(out(3L) == None)       // nothing at or before 09:00
    assert(out(4L) == Some(200L)) // per-key isolation
  }

  test("forward as-of: earliest right row at or after left time; >= on ties; null when none") {
    val out = AsOfJoin.forward(left, right,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate")
      .select($"event_id", $"asof".getField("o_orderkey").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L) == Some(101L)) // 11:00 is earliest >= 10:00
    assert(out(2L) == Some(102L)) // exact timestamp tie joins (>=)
    assert(out(3L) == Some(100L)) // 09:30 is earliest >= 09:00
    assert(out(4L) == None)       // nothing at or after 10:30 for key 20
  }

  test("nearest as-of: closer match wins, exact tie and equidistance go backward") {
    val l2 = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // 09:30 (30m back) vs 11:00 (60m fwd) -> back
      (2L, 10L, ts("2024-01-01 11:45:00")), // 11:00 (45m back) vs 12:00 (15m fwd) -> fwd
      (3L, 10L, ts("2024-01-01 12:00:00")), // exact-ts right row, delta 0 -> it
      (4L, 10L, ts("2024-01-01 10:15:00")), // EQUIDISTANT 09:30/11:00? no: 45m/45m -> backward
      (5L, 20L, ts("2024-01-01 09:00:00")), // only a future match exists
      (6L, 30L, ts("2024-01-01 09:00:00")) // no right rows for key at all
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.nearest(l2, right,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate")
      .select($"event_id", $"asof".getField("o_orderkey").as("k"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L) == Some(100L))
    assert(out(2L) == Some(102L))
    assert(out(3L) == Some(102L))
    assert(out(4L) == Some(100L)) // 45m either way: backward wins the tie
    assert(out(5L) == Some(200L)) // forward-only match
    assert(out(6L) == None)
  }

  test("backward as-of: full right payload available via asof struct") {
    val out = AsOfJoin.backward(left, right,
      "user_id", "o_custkey", "ts", "o_orderdate")
    val row = out.filter($"event_id" === 1L).collect().head
    val asof = row.getStruct(row.fieldIndex("asof"))
    assert(asof.getAs[Long]("o_orderkey") == 100L)
    assert(asof.getAs[java.sql.Timestamp]("o_orderdate") == ts("2024-01-01 09:30:00"))
  }
}
