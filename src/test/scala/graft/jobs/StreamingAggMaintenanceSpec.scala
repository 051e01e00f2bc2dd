package graft.jobs

import java.nio.file.Files

import graft.SparkTestBase
import graft.jobs.AggMaintenance.MergeSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingAggMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = MergeSpec(
    keys = Seq("k"), sums = Seq("n", "s"), mins = Seq("lo"), maxs = Seq("hi"))

  private def row(k: String, v: Long) = (k, 1L, v, v, v)

  test("streamed maintenance across a restart equals the one-shot aggregate; epoch replay is a no-op") {
    val stateDir = Files.createTempDirectory("graft_aggstream_state_").toString
    val chk = Files.createTempDirectory("graft_aggstream_chk_").toString
    val mem = MemoryStream[(String, Long, Long, Long, Long)](spark)
    val facts = mem.toDF.toDF("k", "n", "s", "lo", "hi")

    mem.addData(row("a", 5L), row("b", 7L))
    val q1 = AggMaintenance.maintainStream(facts, stateDir, chk, spec)
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint: epoch sequence resumes, state continues
    mem.addData(row("a", -2L), row("c", 4L))
    val q2 = AggMaintenance.maintainStream(facts, stateDir, chk, spec)
    q2.processAllAvailable()
    q2.stop()

    val state = AggMaintenance.current(spark, stateDir).get
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(state == Map(
      "a" -> ((2L, 3L, -2L, 5L)),
      "b" -> ((1L, 7L, 7L, 7L)),
      "c" -> ((1L, 4L, 4L, 4L))))

    // the crash-window arm foreachBatch can hit: the same epoch replays
    // after a commit — the ledger must detect and skip it
    val replay = Seq(row("a", 5L), row("b", 7L)).toDF("k", "n", "s", "lo", "hi")
    assert(!AggMaintenance.applyBatch(spark, replay, stateDir, "epoch-0", spec))
    val after = AggMaintenance.current(spark, stateDir).get
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(after.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap == state)
  }
}
