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

  test("cmsEstimates: never undercounts; exact when wide; partition-invariant") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => i % 7).toDF("k") // key j appears ~43x
    val exact = rows.groupBy(col("k").cast("string").as("key"))
      .agg(count(lit(1)).as("exact_n"))
    // wide sketch: 7 keys into 512 buckets x 4 rows — collisions
    // vanishingly unlikely, estimates must be EXACT
    val wide = Sketches.cmsEstimates(rows, col("k"), exact, "key", 4, 512)
      .select("key", "exact_n", "cms_n").collect()
    wide.foreach(r => assert(r.getLong(2) == r.getLong(1), s"wide: $r"))
    // width 1: every key collides with everything — estimate = total n
    val collapsed = Sketches.cmsEstimates(rows, col("k"), exact, "key", 2, 1)
      .select("cms_n").as[Long].collect()
    assert(collapsed.forall(_ == 300L))
    // narrow: overestimates allowed, undercounts never; and the sketch
    // is bit-identical under a different partitioning (integer merges)
    val narrow = Sketches.cmsEstimates(rows, col("k"), exact, "key", 4, 4)
      .select("key", "exact_n", "cms_n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    narrow.foreach { case (k, ex, est) => assert(est >= ex, s"undercount at $k") }
    val narrow2 = Sketches.cmsEstimates(rows.repartition(13), col("k"), exact, "key", 4, 4)
      .select("key", "exact_n", "cms_n").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(narrow.sortBy(_._1).toSeq == narrow2.sortBy(_._1).toSeq)
    // NULL keys are excluded from the sketch, not NPEs
    val withNull = Seq(Some(1L), None, Some(1L)).toDF("k")
    val est1 = Sketches.cmsEstimates(withNull, col("k"),
        Seq("1").toDF("key"), "key", 2, 8)
      .select("cms_n").as[Long].head()
    assert(est1 == 2L)
  }

  test("kmvDistinct: exact under k, estimator within RSE above k, partition-invariant") {
    // key "small": 10 distinct items (< k=16) -> exact branch
    // key "big": 5000 distinct items -> estimator branch
    val rows = ((0 until 10).map(i => ("small", s"u$i")) ++
      (0 until 5000).flatMap(i => Seq(("big", s"v$i"), ("big", s"v$i")))).toDF("k", "item")
    val out = Sketches.kmvDistinct(rows, col("k"), col("item"), k = 16)
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("small") == ((10L, 10L)), s"exact branch: ${out("small")}")
    val (nBig, estBig) = out("big")
    assert(nBig == 10000L)
    // RSE = 1/sqrt(k-2) ~ 27% at k=16; allow 4 sigma
    assert(math.abs(estBig - 5000L) < 5000L, s"estimate wildly off: $estBig")

    // mergeability: the estimate must not depend on physical partitioning
    val repart = Sketches.kmvDistinct(rows.repartition(13), col("k"), col("item"), k = 16)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(repart("big") == estBig && repart("small") == 10L,
      "kmv estimate must be partition-invariant")
  }

  test("kmvOverlap: exact jaccard/union when sets fit in k; identical sets hit 1e6 ppm") {
    val rows = ((0 until 8).map(i => ("a", s"x$i")) ++   // a = {x0..x7}
      (4 until 12).map(i => ("b", s"x$i")) ++            // b = {x4..x11}, |a∩b|=4, |a∪b|=12
      (0 until 8).map(i => ("c", s"x$i"))                // c == a
      ).toDF("k", "item")
    val out = Sketches.kmvOverlap(rows, col("k"), col("item"), k = 64)
      .as[(String, String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(out(("a", "b")) == ((12L, 4L, 333333L)), s"a-b: ${out(("a", "b"))}")
    assert(out(("a", "c")) == ((8L, 8L, 1000000L)), s"a-c: ${out(("a", "c"))}")
    assert(out(("b", "c")) == ((12L, 4L, 333333L)), s"b-c: ${out(("b", "c"))}")
  }

  test("kmvRollup: leaf-merged levels equal direct sketches; exact under k; row sums") {
    import org.apache.spark.sql.functions.col
    // l1=s1: two leaves of 6 distinct each, 2 shared -> 10 distinct at l1
    // (under k=8: exact). l1=s2: one leaf with 30 distinct (over k ->
    // estimator branch, must STILL equal the direct computation).
    val rows = ((0 until 6).map(i => ("s1", "x", s"u$i")) ++
      (4 until 10).map(i => ("s1", "y", s"u$i")) ++
      (0 until 30).map(i => ("s2", "x", s"v$i")) ++
      (0 until 6).map(i => ("s1", "x", s"u$i"))          // dup rows
      ).toDF("l1", "l2", "item")
    val out = Sketches.kmvRollup(rows, col("l1"), col("l2"), col("item"), k = 8)
      .as[(Long, Option[String], Option[String], Long, Long)].collect()
      .map(t => (t._1, t._2.getOrElse("-"), t._3.getOrElse("-")) ->
        ((t._4, t._5))).toMap
    assert(out((2L, "s1", "x")) == ((12L, 6L)))
    assert(out((2L, "s1", "y")) == ((6L, 6L)))
    assert(out((1L, "s1", "-"))._1 == 18L)
    // under k after merge? 10 distinct > k=8 -> estimator branch; must
    // equal the direct kmvDistinct on l1
    val direct = Sketches.kmvDistinct(
        rows.toDF("l1", "l2", "item"), col("l1"), col("item"), k = 8)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(out((1L, "s1", "-"))._2 == direct("s1"), "merged must equal direct")
    assert(out((1L, "s2", "-"))._2 == direct("s2"))
    // grand total vs direct single-key run
    val all = Sketches.kmvDistinct(
        rows.selectExpr("'g' AS k", "item"), col("k"), col("item"), k = 8)
      .as[(String, Long, Long)].collect().head
    assert(out((0L, "-", "-")) == ((48L, all._3)), s"${out((0L, "-", "-"))}")
  }
}
