package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables
import graft.ext.TextOps

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def requireFixtures(): Unit =
    assume(new java.io.File(dir).isDirectory, s"fixture dir $dir not present")

  test("token sketch estimates the exact distinct-token count within HLL error") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    val exact = docs.select(explode(TextOps.tokens(col("text"))).as("t"))
      .agg(count_distinct(col("t"))).head().getLong(0)
    val est = Sketches.tokenSketch(docs)
      .select(Sketches.estimate(col("sketch"))).head().getLong(0)
    val err = math.abs(est - exact).toDouble / exact
    assert(err < 0.05, s"estimate $est vs exact $exact (err $err)")
  }

  test("per-batch sketches merge to the whole-corpus sketch (lossless union)") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    // three "daily" ingest batches
    val batches = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    val perBatch = batches.map(Sketches.tokenSketch(_)).reduce(_ union _)
    val merged = Sketches.merge(perBatch)
      .select(Sketches.estimate(col("sketch")).as("est"), col("n_tokens")).head()
    val whole = Sketches.tokenSketch(docs)
      .select(Sketches.estimate(col("sketch")).as("est"), col("n_tokens")).head()
    // mergeability is exact: same estimator state either way
    assert(merged.getLong(0) == whole.getLong(0),
      s"merged ${merged.getLong(0)} != whole ${whole.getLong(0)}")
    assert(merged.getLong(1) == whole.getLong(1), "summed totals must match")
  }

  test("content sketch yields a usable exact-dup-rate estimate") {
    requireFixtures()
    val docs = Tables.documents(spark, dir)
    // duplicate every 4th doc once: true distinct = n, total = n + n/4
    val dups = docs.filter(col("doc_id") % 4 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val withDups = docs.union(dups)
    val r = Sketches.contentSketch(withDups)
      .select(Sketches.estimate(col("sketch")).as("est"), col("n_docs")).head()
    val trueDistinct = docs.select(TextOps.fingerprint(col("text")))
      .distinct().count()
    val err = math.abs(r.getLong(0) - trueDistinct).toDouble / trueDistinct
    assert(err < 0.05, s"estimate ${r.getLong(0)} vs exact $trueDistinct")
    val dupRate = 1.0 - r.getLong(0).toDouble / r.getLong(1)
    val trueRate = 1.0 - trueDistinct.toDouble / withDups.count()
    assert(math.abs(dupRate - trueRate) < 0.05, s"dup rate $dupRate vs $trueRate")
  }
}
