package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusWriterSpec extends SparkTestBase {
  import spark.implicits._

  test("writeSharded: file count tracks corpus size, files cover disjoint sorted ranges") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = spark.range(10000).select(col("id").as("doc_id"),
      concat(lit("text for "), col("id")).as("text"))
    val planned = CorpusWriter.writeSharded(docs, dir, col("doc_id"),
      targetRowsPerFile = 1000L)
    assert(planned == 10)

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toList
    // file count tracks the plan (range sampling skews boundaries and
    // the maxRecordsPerFile backstop splits oversized partitions, so
    // actual lands in [planned, 2x planned] — never thousands, never 1)
    assert(files.size >= planned && files.size <= 2 * planned,
      s"got ${files.size} files for planned $planned")

    // round trip preserves everything
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(countDistinct(col("doc_id"))).head().getLong(0) == 10000)

    // per-file min/max ranges are DISJOINT (the zone-map property):
    // sort files by their min id; each file's max < next file's min
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("doc_id"), max("doc_id"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }.sortBy(_._1)
    ranges.foreach { case (_, _, n) =>
      assert(n <= 1000L, s"maxRecordsPerFile backstop violated: $n")
    }
    ranges.sliding(2).foreach {
      case Seq((_, hi, _), (lo2, _, _)) =>
        assert(hi < lo2, s"file ranges overlap: max $hi vs next min $lo2")
      case _ =>
    }
  }

  test("shardPlan: single undersized corpus collapses to one partition") {
    val docs = spark.range(10).select(col("id").as("doc_id"))
    val planned = CorpusWriter.shardPlan(docs, col("doc_id"), targetRowsPerFile = 1000L)
    assert(planned.rdd.getNumPartitions == 1)
  }
}
