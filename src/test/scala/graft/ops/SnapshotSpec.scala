package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged, null-safely") {
    val oldDf = Seq(
      (1L, "stable text"),
      (2L, "will be edited"),
      (3L, "will be deleted"),
      (4L, null: String),   // null -> null  = unchanged
      (5L, null: String)    // null -> text  = changed
    ).toDF("doc_id", "text")
    val newDf = Seq(
      (1L, "stable text"),
      (2L, "was edited"),
      (4L, null: String),
      (5L, "now has text"),
      (6L, "brand new")
    ).toDF("doc_id", "text")
    val got = Snapshot.diff(oldDf, newDf)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))

    val stats = Snapshot.diffStats(oldDf, newDf)
      .as[(String, Long)].collect().toMap
    assert(stats == Map(
      "unchanged" -> 2L, "changed" -> 2L, "removed" -> 1L, "added" -> 1L))
  }

  test("diff of a snapshot against itself is all-unchanged (fixture scale)") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val statuses = Snapshot.diff(docs, docs)
      .select("status").distinct().as[String].collect().toList
    assert(statuses == List("unchanged"))
  }
}
