package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

class ReconcileSpec extends SparkTestBase {
  import spark.implicits._

  private def snap(rows: (Long, Option[Long], String)*): DataFrame =
    rows.toDF("k", "v", "s")

  test("tableDiff classifies insert/delete/update with column-level change lists") {
    val before = snap((1L, Some(10L), "a"), (2L, Some(20L), "b"),
      (3L, Some(30L), "c"), (4L, Some(40L), "d"))
    val after = snap((1L, Some(10L), "a"), // unchanged -> filtered
      (2L, Some(25L), "b"),                // v changed
      (3L, Some(31L), "x"),                // both changed
      (5L, Some(50L), "e"))                // new key; 4 deleted
    val out = Reconcile.tableDiff(before, after, Seq("k"), Seq("v", "s"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(out == Set(
      (2L, "update", Some("v")),
      (3L, "update", Some("v,s")),
      (4L, "delete", None),
      (5L, "insert", None)))
  }

  test("tableDiff compares null-safely: NULL->value and value->NULL are changes") {
    val before = snap((1L, None, "a"), (2L, Some(2L), "b"), (3L, None, "c"))
    val after = snap((1L, Some(1L), "a"), (2L, None, "b"), (3L, None, "c"))
    val out = Reconcile.tableDiff(before, after, Seq("k"), Seq("v", "s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // NULL == NULL at key 3 -> not a change, row filtered
    assert(out == Set((1L, "update", "v"), (2L, "update", "v")))
  }

  test("tableDiff changed_cols follows compareCols declaration order") {
    val before = snap((1L, Some(1L), "a"))
    val after = snap((1L, Some(2L), "z"))
    val sv = Reconcile.tableDiff(before, after, Seq("k"), Seq("s", "v"))
      .collect().head.getString(2)
    assert(sv == "s,v")
  }
}
