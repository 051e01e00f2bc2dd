package graft.ops

import graft.SparkTestBase
import graft.core.Telemetry

/** Pins the reference Q1/Q2 semantics (SURVEY.md §7.4): window boundary
  * inclusivity, strict HAVING, AVG(BIGINT) truncation, NULL event_time
  * exclusion, date-part casts.
  */
class SensorOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def alertRows(data: Seq[Telemetry]) =
    SensorOps.alerts(data.toDF())
      .as[(String, Long, java.sql.Timestamp)].collect().toList.sortBy(r => (r._3.getTime, r._1))

  test("Q1: strict HAVING count(*) > 3 — 4 hot readings alert, 3 don't (main.py:86)") {
    val hot = (0 until 4).map(i => Telemetry("s1", 31, ts(s"2024-01-01 00:00:0$i")))
    val warm = (0 until 3).map(i => Telemetry("s2", 32, ts(s"2024-01-01 00:00:0$i")))
    val cold = (0 until 10).map(i => Telemetry("s3", 30, ts(f"2024-01-01 00:00:$i%02d"))) // not > 30
    val out = alertRows(hot ++ warm ++ cold)
    assert(out == List(("s1", 4L, ts("2024-01-01 00:00:00"))))
  }

  test("Q1: window boundary — t = k*30s belongs to [k*30, k*30+30)") {
    val w0 = Seq(0, 10, 20, 29).map(i => Telemetry("s1", 31, ts(f"2024-01-01 00:00:$i%02d")))
    val w1 = Seq(30, 35, 40, 59).map(i => Telemetry("s1", 31, ts(f"2024-01-01 00:00:$i%02d")))
    val out = alertRows(w0 ++ w1)
    assert(out.map(_._3) == List(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:30")))
    assert(out.map(_._2) == List(4L, 4L))
  }

  test("Q1: NULL event_time rows fall out of windows (main.py:17 nullable)") {
    val valid = (0 until 4).map(i => Telemetry("s1", 31, ts(s"2024-01-01 00:00:0$i")))
    val nulls = (0 until 10).map(_ => Telemetry("s1", 31, null))
    assert(alertRows(valid ++ nulls).map(_._2) == List(4L))
  }

  test("Q2: AVG(BIGINT) truncates like Flink — {31,32} -> 31 (main.py:62,94)") {
    val data = Seq(Telemetry("s1", 31, ts("2024-01-01 00:00:01")),
      Telemetry("s1", 32, ts("2024-01-01 00:00:02")))
    val out = SensorOps.windowedAvg(data.toDF())
      .as[(String, Long, java.sql.Timestamp)].collect().toList
    assert(out == List(("s1", 31L, ts("2024-01-01 00:00:00"))))
  }

  test("Q2: date-part partition columns are LONG and correct (main.py:64-67)") {
    val data = Seq(Telemetry("s1", 30, ts("2024-03-05 17:42:11")))
    val row = SensorOps.avgWithPartitions(data.toDF()).collect().head
    val schema = SensorOps.avgWithPartitions(data.toDF()).schema
    Seq("year", "month", "day", "hour").foreach { c =>
      assert(schema(c).dataType.typeName == "long", s"$c should be long")
    }
    assert(row.getAs[Long]("year") == 2024L)
    assert(row.getAs[Long]("month") == 3L)
    assert(row.getAs[Long]("day") == 5L)
    assert(row.getAs[Long]("hour") == 17L)
    assert(row.getAs[Long]("avg_temp") == 30L)
  }

  test("alert message matches the consumer Lambda template (kfpLambdaConsumerSNS.py:17-18)") {
    val df = Seq(("s7", ts("2024-01-01 00:00:30"))).toDF("sensor_id", "start_event_time")
      .withColumn("message", SensorOps.alertMessage())
    assert(df.select("message").as[String].head() ==
      "Sensor Id: s7 has exceeded the set threshold at the window start time: 2024-01-01T00:00:30")
  }

  test("truncatedAvg: Flink AVG(BIGINT) truncates toward zero, incl. negatives") {
    import org.apache.spark.sql.functions.window
    val data = Seq(("s1", -5L, ts("2024-01-01 00:00:01")),
      ("s1", -6L, ts("2024-01-01 00:00:02")))
      .toDF("sensor_id", "temperature", "event_time")
    val out = data.groupBy($"sensor_id")
      .agg(SensorOps.truncatedAvg("temperature").as("avg_temp"))
      .as[(String, Long)].collect().toList
    // sum=-11, count=2: Flink integer division gives -5; floor would give -6
    assert(out == List(("s1", -5L)))
  }
}
