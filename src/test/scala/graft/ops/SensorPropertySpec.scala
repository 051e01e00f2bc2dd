package graft.ops

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.core.Telemetry

/** Property-based pins for Q1/Q2 semantics (SURVEY.md §5 item 5) over
  * generator-faithful random streams (sensor ∈ "1".."5", temperature ∈
  * [27,32] — `kfpLambdaStreamProducer.py:51-52`). Plain ScalaCheck
  * generators with fixed seeds (deterministic, no bridge dependency).
  */
class SensorPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val telemetryGen: Gen[Telemetry] = for {
    sensor <- Gen.chooseNum(1, 5)
    temp <- Gen.chooseNum(27L, 32L)
    offsetSec <- Gen.chooseNum(0L, 600L)
  } yield Telemetry(sensor.toString, temp,
    new Timestamp(1704067200000L + offsetSec * 1000L)) // 2024-01-01T00:00Z

  private val streamGen: Gen[List[Telemetry]] = Gen.listOfN(120, telemetryGen)

  private def samples(n: Int): Seq[List[Telemetry]] =
    (1 to n).map(i => streamGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("Q1 invariants: counts strictly > 3; window starts 30s-aligned; counts match manual grouping") {
    samples(5).foreach { data =>
      val out = SensorOps.alerts(data.toDF())
        .as[(String, Long, Timestamp)].collect().toList
      val manual = data
        .filter(t => t.temperature > 30 && t.event_time != null)
        .groupBy(t => (t.sensor_id, t.event_time.getTime / 30000L * 30000L))
        .view.mapValues(_.size.toLong).toMap
        .filter(_._2 > 3)
      assert(out.forall(_._2 > 3))
      assert(out.forall(_._3.getTime % 30000L == 0))
      val outMap = out.map { case (s, c, w) => (s, w.getTime) -> c }.toMap
      assert(outMap == manual)
    }
  }

  test("Q2 invariants: avg_temp equals floor-div of sums per window; every input window present") {
    samples(5).foreach { data =>
      val out = SensorOps.windowedAvg(data.toDF())
        .as[(String, Long, Timestamp)].collect().toList
      val manual = data
        .groupBy(t => (t.sensor_id, t.event_time.getTime / 60000L * 60000L))
        .view.mapValues(ts => ts.map(_.temperature).sum / ts.size).toMap
      val outMap = out.map { case (s, a, w) => (s, w.getTime) -> a }.toMap
      assert(outMap == manual)
    }
  }
}
