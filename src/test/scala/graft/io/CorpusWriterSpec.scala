package graft.io

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusWriterSpec extends SparkTestBase {
  import spark.implicits._

  test("writeSharded: file count tracks corpus size, files cover disjoint sorted ranges") {
    val dir = Files.createTempDirectory("graft_shards").toString + "/corpus"
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

  test("writeSharded refuses to clobber an existing drop unless Overwrite is passed") {
    val dir = Files.createTempDirectory("graft_shards_mode").toString + "/corpus"
    val docs = spark.range(100).select(col("id").as("doc_id"))
    CorpusWriter.writeSharded(docs, dir, col("doc_id"), targetRowsPerFile = 50L)
    // default ErrorIfExists: a second publish to the same path must throw
    intercept[org.apache.spark.sql.AnalysisException] {
      CorpusWriter.writeSharded(docs, dir, col("doc_id"), targetRowsPerFile = 50L)
    }
    // explicit Overwrite replaces the drop
    val replaced = spark.range(40).select(col("id").as("doc_id"))
    CorpusWriter.writeSharded(replaced, dir, col("doc_id"), targetRowsPerFile = 50L,
      mode = SaveMode.Overwrite)
    assert(spark.read.parquet(dir).count() == 40)
  }

  /** Every FileSourceScanExec in the executed plan, looking through AQE. */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case s: FileSourceScanExec    => Seq(s)
    case other => other.children.flatMap(scans)
  }

  /** Rows the parquet reader actually materialized for a point-range
    * read — the SCAN node's numOutputRows counts rows from row groups
    * that SURVIVED footer min/max pruning (the exact filter re-runs in
    * the FilterExec above), so it is a direct row-group-skip meter.
    */
  private def rowsMaterialized(df: DataFrame): Long = {
    df.collect() // metrics exist only after execution, on this same instance
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("sharded layout: a sort-key range read prunes files and row groups; unsorted cannot") {
    val base = Files.createTempDirectory("graft_zonemap").toString
    val docs = spark.range(10000).select(col("id").as("doc_id"),
      concat(lit("text for "), col("id")).as("text"))
    CorpusWriter.writeSharded(docs, s"$base/sorted", col("doc_id"),
      targetRowsPerFile = 1000L)
    // the control: same data, same file count, hash-scattered ids — the
    // layout a plain .repartition(10).write produces
    docs.repartition(10).write.parquet(s"$base/unsorted")

    def fileRanges(path: String): Seq[(Long, Long)] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getPath).agg(min("doc_id"), max("doc_id")).head()
          (r.getLong(0), r.getLong(1))
        }.toSeq

    // manifest-level pruning: a reader that checks footer/zone-map
    // ranges opens 1 sorted file for a 100-id range, but nearly every
    // unsorted file straddles it
    val (lo, hi) = (5000L, 5099L)
    val sortedHits = fileRanges(s"$base/sorted").count { case (mn, mx) => mx >= lo && mn <= hi }
    val unsortedHits = fileRanges(s"$base/unsorted").count { case (mn, mx) => mx >= lo && mn <= hi }
    assert(sortedHits <= 2, s"sorted layout: $sortedHits files intersect a 1%-range read")
    assert(unsortedHits >= 8, s"hash layout should straddle the range everywhere: $unsortedHits")

    // Spark-reader-level pruning: parquet row-group min/max skipping
    // materializes ~1 file's rows from the sorted layout and the whole
    // corpus from the unsorted one (1000-row files are single row groups)
    def rangeRead(path: String): DataFrame =
      spark.read.parquet(path).filter(col("doc_id").between(lo, hi))
    val sortedRows = rowsMaterialized(rangeRead(s"$base/sorted"))
    val unsortedRows = rowsMaterialized(rangeRead(s"$base/unsorted"))
    assert(sortedRows <= 2000L,
      s"sorted layout must skip non-matching row groups, materialized $sortedRows")
    assert(unsortedRows >= 9000L,
      s"unsorted layout cannot skip (control): materialized $unsortedRows")
  }

  test("shardPlan: single undersized corpus collapses to one partition") {
    val docs = spark.range(10).select(col("id").as("doc_id"))
    val planned = CorpusWriter.shardPlan(docs, col("doc_id"), targetRowsPerFile = 1000L)
    assert(planned.rdd.getNumPartitions == 1)
  }
}
