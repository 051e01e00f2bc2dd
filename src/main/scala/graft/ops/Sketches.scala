package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Mergeable cardinality summaries (Apache DataSketches HLL, built into
  * Spark SQL) for INCREMENTAL corpus monitoring — the 100 TB answer to
  * "how many distinct tokens / documents does the corpus have now?"
  * after every ingest batch:
  *
  *  - sketch each batch once as it lands (one scan, a few KB of state
  *    per sketch — `lgK = 12` ⇒ ~1.6% relative standard error);
  *  - persist the per-batch sketch rows;
  *  - answer corpus-wide questions by UNIONING sketches — milliseconds
  *    over per-batch rows instead of a re-scan of every batch.
  *
  * Exact `count_distinct` over 100 TB is a full shuffle of every
  * distinct value; the sketches trade ~1% error for constant-size state
  * and lossless mergeability (union of part-sketches ≡ sketch of the
  * whole, a DataSketches guarantee).
  */
object Sketches {

  /** One-row frame: HLL sketch of DISTINCT TOKENS plus exact row/token
    * totals for the batch (the totals are cheap — they ride the same
    * scan as partial aggregates).
    */
  def tokenSketch(docs: DataFrame, textCol: String = "text",
                  lgK: Int = 12): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .agg(hll_sketch_agg(col("t"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_tokens"))

  /** One-row frame: HLL sketch of DISTINCT CONTENT FINGERPRINTS plus the
    * batch row count — `1 − estimate/n_docs` is the batch's exact-dup
    * rate without running the dedup itself.
    */
  def contentSketch(docs: DataFrame, textCol: String = "text",
                    lgK: Int = 12): DataFrame =
    docs.select(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(hll_sketch_agg(col("fp"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_docs"))

  /** Merge per-batch sketch rows into one corpus-wide sketch (additional
    * numeric columns are summed). Lossless: merging part sketches yields
    * the same estimator state as sketching the concatenated input.
    */
  def merge(sketches: DataFrame, sketchCol: String = "sketch"): DataFrame = {
    val numeric = sketches.schema.fields
      .filter(f => f.name != sketchCol && f.dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType])
      .map(f => sum(col(f.name)).as(f.name))
    sketches.agg(hll_union_agg(col(sketchCol)).as(sketchCol), numeric.toSeq: _*)
  }

  /** Estimated distinct count of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Count–min frequency estimates ([[graft.functions.CountMinSketch]]):
    * build ONE `depth × width` sketch over `rows` and attach `cms_n` —
    * the sketch's never-underestimating count — to every probe row.
    * NULL keys are excluded from the sketch (a NULL has no frequency
    * identity; callers decide their null policy upstream).
    *
    * Scale shape: the build is one aggregate pass whose partials merge
    * by counter addition (depth·width longs per task, independent of
    * row count); the probe side broadcasts the ONE-row sketch onto the
    * probe keys — a 1-row nested-loop by design, the cheapest possible
    * join — and evaluates `min_r counter[r][h_r(key)]` with codegen'd
    * `element_at`/`least` over the array column. At 100 TB the sketch
    * build reads every row once and ships kilobytes; the probe never
    * touches the raw rows again.
    */
  def cmsEstimates(
      rows: DataFrame,
      keyCol: Column,
      probes: DataFrame,
      probeKeyCol: String,
      depth: Int,
      width: Int
  ): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val keyed = rows.select(keyCol.cast("string").as("k"))
      .filter(col("k").isNotNull).as[String]
    val cms = graft.functions.CountMinSketch(depth, width)
    // __-prefixed internal name (repo convention): a probe frame with
    // its own `sketch` column must not collide with the broadcast side
    val sketchDf = keyed.select(cms.toColumn.name("__sketch")).toDF("__sketch")
    val est = (0 until depth).map { r =>
      element_at(col("__sketch"),
        (lit(r * width) +
          pmod(graft.functions.Hashing.md5Hash32(r, col(probeKeyCol).cast("string")),
            lit(width)) + 1).cast("int"))
    }.reduce(least(_, _))
    probes.crossJoin(broadcast(sketchDf))
      .withColumn("cms_n", est)
      .drop("__sketch")
  }

  /** Bounded min-k accumulator for the KMV sketch: the k SMALLEST
    * DISTINCT hash values seen, kept sorted ascending. O(k) state per
    * group with lossless merge (min-k of a union = min-k of the two
    * min-k sets) — the mergeability that makes the sketch a one-scan,
    * map-side-partial aggregate at any scale.
    */
  private[ops] case class KmvState(hs: Seq[Long])

  private[ops] class MinKHashes(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, KmvState, KmvState] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: KmvState = KmvState(Vector.empty)
    // The buffer is kept sorted ascending, so membership + insertion
    // point come from one binary search — O(log k) compare + O(k)
    // splice per admitted row, no per-row re-sort on the hot path.
    override def reduce(b: KmvState, h: Long): KmvState = {
      val hs = b.hs
      if (hs.length >= k && h >= hs(hs.length - 1)) b
      else {
        var lo = 0
        var hi = hs.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (hs(mid) < h) lo = mid + 1 else hi = mid
        }
        if (lo < hs.length && hs(lo) == h) b
        else {
          val spliced = (hs.take(lo) :+ h) ++ hs.drop(lo)
          KmvState(if (spliced.length > k) spliced.take(k) else spliced)
        }
      }
    }
    override def merge(a: KmvState, b: KmvState): KmvState =
      KmvState((a.hs ++ b.hs).distinct.sorted.take(k))
    override def finish(r: KmvState): KmvState = r
    override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    override def outputEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  }

  /** [[MinKHashes]]' MERGE exposed as an aggregator over whole sketch
    * arrays — what [[kmvRollup]] feeds child sketches through, one
    * groupBy per level instead of an explode + rejoin.
    */
  private[ops] class MinKMerge(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Long], KmvState, KmvState] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: KmvState = KmvState(Vector.empty)
    override def reduce(b: KmvState, hs: Seq[Long]): KmvState =
      KmvState((b.hs ++ hs).distinct.sorted.take(k))
    override def merge(a: KmvState, b: KmvState): KmvState =
      KmvState((a.hs ++ b.hs).distinct.sorted.take(k))
    override def finish(r: KmvState): KmvState = r
    override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    override def outputEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  }

  /** KMV (k-minimum-values) distinct estimate per key — the
    * ORACLE-REPLAYABLE counterpart to the HLL sketches above: items
    * hash through the portable md5 family, each key keeps only its k
    * smallest distinct hash values, and the estimate is the classic
    * `(k−1)·2³² DIV h_(k)` (exact count when fewer than k distinct
    * hashes exist — the sketch IS the value set then). Deterministic
    * end to end: the same data yields the same estimate on any engine,
    * so the gate is bit-exact, not a tolerance band.
    *
    * Scale shape: one narrow shuffle on the key with O(k) aggregation
    * buffers and map-side partial merge — the 100 TB answer to
    * per-key distinct counts when `count_distinct`'s full shuffle of
    * every distinct value is the bottleneck. k trades memory for
    * accuracy (RSE ≈ 1/√(k−2)).
    *
    * Output per key: `n_rows`, `est_distinct`.
    */
  def kmvDistinct(
      df: DataFrame,
      keyCol: Column,
      itemCol: Column,
      k: Int = 256,
      seed: Int = 11
  ): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val mink = udaf(new MinKHashes(k))
    df.filter(keyCol.isNotNull && itemCol.isNotNull)
      .select(keyCol.as("key"),
        graft.functions.Hashing.md5Hash32(seed, itemCol.cast("string")).as("hv"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_rows"), mink(col("hv")).as("__s"))
      .withColumn("est_distinct",
        when(size(col("__s.hs")) < k, size(col("__s.hs")).cast("long"))
          .otherwise(expr(s"CAST(${(k - 1).toLong} * 4294967296 AS BIGINT)" +
            s" DIV element_at(__s.hs, $k)")))
      .drop("__s")
  }

  /** KMV set-overlap estimates for every UNORDERED pair of keys,
    * emitted once each under `key_a < key_b` — union
    * cardinality and Jaccard from the sketches alone, no second pass
    * over the data: for keys a < b, the union's min-k is the min-k of
    * the two sketches merged, the union estimate is [[kmvDistinct]]'s
    * estimator over it, and `jaccard_ppm` is the share of those union
    * min-k hashes present in BOTH sketches (the standard KMV Jaccard,
    * exact when both key's distinct counts fit inside k). md5-family
    * deterministic — bit-exact on any engine.
    *
    * Scale contract: sketches are one narrow O(k)-state shuffle over
    * the data; the pair grid is |keys|² over k-length arrays — meant
    * for BOUNDED key domains (sources, languages, splits: the q175
    * class), not unbounded ones. The pair stage never rereads rows.
    */
  def kmvOverlap(
      df: DataFrame,
      keyCol: Column,
      itemCol: Column,
      k: Int = 256,
      seed: Int = 11
  ): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val mink = udaf(new MinKHashes(k))
    val sk = df.filter(keyCol.isNotNull && itemCol.isNotNull)
      .select(keyCol.as("key"),
        graft.functions.Hashing.md5Hash32(seed, itemCol.cast("string")).as("hv"))
      .groupBy("key")
      .agg(mink(col("hv")).as("__s"))
      .select(col("key"), col("__s.hs").as("hs"))
    val a = sk.select(col("key").as("key_a"), col("hs").as("__ha"))
    val b = sk.select(col("key").as("key_b"), col("hs").as("__hb"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("__m",
        slice(array_sort(array_union(col("__ha"), col("__hb"))), 1, k))
      .withColumn("__d", size(col("__m")))
      .withColumn("union_est",
        when(col("__d") < k, col("__d").cast("long"))
          .otherwise(expr(s"CAST(${(k - 1).toLong} * 4294967296 AS BIGINT)" +
            s" DIV element_at(__m, $k)")))
      .withColumn("__inter",
        size(array_intersect(array_intersect(col("__m"), col("__ha")),
          col("__hb"))))
      .withColumn("jaccard_ppm",
        expr("CAST(__inter AS BIGINT) * 1000000 DIV __d"))
      .select(col("key_a"), col("key_b"), col("union_est"),
        col("__inter").cast("long").as("n_common_mink"), col("jaccard_ppm"))
  }

  /** Hierarchical KMV rollup — distinct counts at THREE grouping
    * levels from ONE scan of the data, exploiting the property that
    * makes sketches the 100 TB answer: min-k sketches MERGE losslessly
    * (the union's k smallest hashes are among the children's k
    * smallest), so the `(l1)` and grand-total sketches are built from
    * the `(l1, l2)` leaf sketches — k-length arrays — without
    * rereading a single row. A `GROUPING SETS` distinct-count would
    * rescan (or reshuffle every distinct value) once per level.
    *
    * Merged estimates are IDENTICAL to directly-computed ones (not
    * approximately — the merge is exact on the sketch), which is what
    * the oracle exploits: it recomputes each level from scratch and
    * must match bit for bit.
    *
    * Output: `(lvl, l1, l2, n_rows, est_distinct)` with `lvl` = 2
    * (leaf), 1 (per-l1, `l2` NULL), 0 (grand total, both NULL) — the
    * rollup NULL convention.
    *
    * Scale: one narrow O(k)-state shuffle over the rows, then two
    * leaf-cell-bounded merges.
    */
  def kmvRollup(
      df: DataFrame,
      l1Col: Column,
      l2Col: Column,
      itemCol: Column,
      k: Int = 64,
      seed: Int = 11
  ): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val mink = udaf(new MinKHashes(k))
    val leaf = df
      .filter(l1Col.isNotNull && l2Col.isNotNull && itemCol.isNotNull)
      .select(l1Col.cast("string").as("l1"), l2Col.cast("string").as("l2"),
        graft.functions.Hashing.md5Hash32(seed, itemCol.cast("string"))
          .as("hv"))
      .groupBy("l1", "l2")
      .agg(count(lit(1)).as("n_rows"), mink(col("hv")).as("__s"))
      .select(col("l1"), col("l2"), col("n_rows"), col("__s.hs").as("hs"))
    def estCol = when(size(col("hs")) < k, size(col("hs")).cast("long"))
      .otherwise(expr(
        s"CAST(${(k - 1).toLong} * 4294967296 AS BIGINT) DIV element_at(hs, $k)"))
    val minkArr = udaf(new MinKMerge(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val lvl2 = leaf.select(lit(2L).as("lvl"), col("l1"), col("l2"),
      col("n_rows"), estCol.as("est_distinct"))
    val mid = leaf.groupBy("l1")
      .agg(sum(col("n_rows")).as("n_rows"), minkArr(col("hs")).as("__s"))
      .select(col("l1"), col("n_rows"), col("__s.hs").as("hs"))
    val lvl1 = mid.select(lit(1L).as("lvl"), col("l1"),
      lit(null).cast("string").as("l2"), col("n_rows"),
      estCol.as("est_distinct"))
    val top = mid
      .agg(sum(col("n_rows")).as("n_rows"), minkArr(col("hs")).as("__s"))
      .select(col("n_rows"), col("__s.hs").as("hs"))
    val lvl0 = top.select(lit(0L).as("lvl"),
      lit(null).cast("string").as("l1"), lit(null).cast("string").as("l2"),
      col("n_rows"), estCol.as("est_distinct"))
    lvl2.unionByName(lvl1).unionByName(lvl0)
      .orderBy("lvl", "l1", "l2")
  }
}
