package graft.jobs

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import graft.jobs.AggMaintenance.MergeSpec

class AggMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = MergeSpec(
    keys = Seq("k"),
    sums = Seq("n", "s"),
    mins = Seq("lo"),
    maxs = Seq("hi"))

  // (k, n=1, s, lo, hi) rows; lo/hi start as the row's own value
  private def rows(data: (String, Long)*): DataFrame =
    data.map { case (k, v) => (k, 1L, v, v, v) }.toDF("k", "n", "s", "lo", "hi")

  private def stateOf(dir: String): Map[String, (Long, Long, Long, Long)] =
    AggMaintenance.current(spark, dir).get
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (k, n, s, lo, hi) => k -> (n, s, lo, hi) }.toMap

  private def tmp(): String =
    Files.createTempDirectory("graft_aggmaint_").toString

  test("split invariance: any batching of the rows yields the one-batch state") {
    val all = Seq(("a", 5L), ("a", -2L), ("b", 7L), ("c", 0L), ("a", 9L), ("b", 1L))
    val whole = tmp()
    AggMaintenance.applyBatch(spark, rows(all: _*), whole, "b0", spec)
    val expected = stateOf(whole)
    assert(expected("a") == (3L, 12L, -2L, 9L))

    for (cut <- Seq(1, 3, 5)) {
      val dir = tmp()
      AggMaintenance.applyBatch(spark, rows(all.take(cut): _*), dir, "b0", spec)
      AggMaintenance.applyBatch(spark, rows(all.drop(cut): _*), dir, "b1", spec)
      assert(stateOf(dir) == expected, s"cut=$cut")
    }
  }

  test("retry of a committed batch is a detected no-op: false, version and state untouched") {
    val dir = tmp()
    assert(AggMaintenance.applyBatch(spark, rows(("a", 1L)), dir, "b0", spec))
    val before = stateOf(dir)
    val pointer = Files.readString(Paths.get(dir, "_CURRENT"))
    assert(!AggMaintenance.applyBatch(spark, rows(("a", 1L)), dir, "b0", spec))
    assert(Files.readString(Paths.get(dir, "_CURRENT")) == pointer)
    assert(stateOf(dir) == before)
  }

  test("crash before the pointer flip: orphan version dir is overwritten by the retry") {
    val dir = tmp()
    AggMaintenance.applyBatch(spark, rows(("a", 1L)), dir, "b0", spec)
    // a crashed attempt wrote (possibly garbage) v2 but never flipped
    Seq(("zz", 99L, 99L, 99L, 99L)).toDF("k", "n", "s", "lo", "hi")
      .write.parquet(s"$dir/v2/agg")
    assert(Files.readString(Paths.get(dir, "_CURRENT")).trim == "v1")
    assert(AggMaintenance.applyBatch(spark, rows(("b", 2L)), dir, "b1", spec))
    assert(Files.readString(Paths.get(dir, "_CURRENT")).trim == "v2")
    assert(stateOf(dir) == Map("a" -> (1L, 1L, 1L, 1L), "b" -> (1L, 2L, 2L, 2L)))
  }

  test("keys only in state or only in batch survive the outer-join merge") {
    val dir = tmp()
    AggMaintenance.applyBatch(spark, rows(("old", 3L)), dir, "b0", spec)
    AggMaintenance.applyBatch(spark, rows(("new", 4L)), dir, "b1", spec)
    assert(stateOf(dir) == Map("old" -> (1L, 3L, 3L, 3L), "new" -> (1L, 4L, 4L, 4L)))
  }

  test("current is None before any batch") {
    assert(AggMaintenance.current(spark, tmp()).isEmpty)
  }

  test("changes: inserts for new keys, updates for changed metrics, unchanged filtered") {
    val dir = tmp()
    AggMaintenance.applyBatch(spark, rows(("a", 5L), ("b", 7L)), dir, "b0", spec)
    AggMaintenance.applyBatch(spark, rows(("a", 1L), ("c", 2L)), dir, "b1", spec)
    val cdc = AggMaintenance.changes(spark, dir, 1, 2, spec)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(cdc.keySet == Set("a", "c")) // b unchanged -> filtered
    assert(cdc("a") == (("a", "update", 2L, 6L, 1L, 5L)))
    assert(cdc("c") == (("c", "insert", 1L, 2L, 2L, 2L)))

    // fromV = 0: everything is an insert, values = the version's state
    val fromZero = AggMaintenance.changes(spark, dir, 0, 1, spec)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(fromZero == Set(("a", "insert", 1L, 5L, 5L, 5L),
      ("b", "insert", 1L, 7L, 7L, 7L)))
  }

  private val sumSpec = MergeSpec(keys = Seq("k"), sums = Seq("n", "s"))

  private def deltas(data: (String, Long, Long)*): DataFrame =
    data.map { case (k, v, sign) => (k, 1L, v, sign) }.toDF("k", "n", "s", "sign")

  test("applyDeltas retracts: sums fold signed, zero-support keys leave the state") {
    val dir = tmp()
    AggMaintenance.applyDeltas(spark, deltas(("a", 5L, 1L), ("a", 2L, 1L), ("b", 7L, 1L)),
      dir, "b0", sumSpec, countCol = "n")
    // retract one of a's facts and ALL of b's
    AggMaintenance.applyDeltas(spark, deltas(("a", 2L, -1L), ("b", 7L, -1L)),
      dir, "b1", sumSpec, countCol = "n")
    val state = AggMaintenance.current(spark, dir).get
      .as[(String, Long, Long)].collect().toSet
    assert(state == Set(("a", 1L, 5L))) // b erased entirely

    // the erased key surfaces as a CDC delete with NULL metrics
    val cdc = AggMaintenance.changes(spark, dir, 1, 2, sumSpec)
      .collect().map(r => (r.getString(0), r.getString(1), r.isNullAt(2))).toSet
    assert(cdc == Set(("a", "update", false), ("b", "delete", true)))
  }

  test("applyDeltas rejects a batch that would drive support negative, committing nothing") {
    val dir = tmp()
    AggMaintenance.applyDeltas(spark, deltas(("a", 5L, 1L)), dir, "b0", sumSpec, "n")
    val before = AggMaintenance.current(spark, dir).get
      .as[(String, Long, Long)].collect().toSet
    intercept[IllegalArgumentException] {
      AggMaintenance.applyDeltas(spark,
        deltas(("a", 5L, -1L), ("a", 5L, -1L)), dir, "b1", sumSpec, "n")
    }
    assert(Files.readString(Paths.get(dir, "_CURRENT")).trim == "v1")
    assert(AggMaintenance.current(spark, dir).get
      .as[(String, Long, Long)].collect().toSet == before)
    // the rejected id is NOT in the ledger: a corrected batch may reuse it
    assert(AggMaintenance.applyDeltas(spark, deltas(("a", 5L, -1L)), dir, "b1", sumSpec, "n"))
    assert(AggMaintenance.current(spark, dir).isDefined)
    assert(AggMaintenance.current(spark, dir).get.count() == 0) // all erased
  }

  test("applyDeltas requires a sums-only spec and a sum countCol") {
    val dir = tmp()
    intercept[IllegalArgumentException] {
      AggMaintenance.applyDeltas(spark, deltas(("a", 1L, 1L)), dir, "b0", spec, "n")
    }
    intercept[IllegalArgumentException] {
      AggMaintenance.applyDeltas(spark, deltas(("a", 1L, 1L)), dir, "b0", sumSpec, "nope")
    }
  }

  test("changes rejects out-of-range version pairs") {
    val dir = tmp()
    AggMaintenance.applyBatch(spark, rows(("a", 1L)), dir, "b0", spec)
    intercept[IllegalArgumentException](
      AggMaintenance.changes(spark, dir, 1, 1, spec))
    intercept[IllegalArgumentException](
      AggMaintenance.changes(spark, dir, 0, 2, spec))
  }
}
