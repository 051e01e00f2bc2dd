package graft.ext

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda" // 1 word differs
  private val far = "one two three four five six seven eight nine ten"

  private def docs = Seq(
    (0L, doc), (1L, doc), (2L, near), (3L, far)
  ).toDF("doc_id", "text")

  test("exactGroups keeps lowest id and counts copies") {
    val g = Dedup.exactGroups(docs).as[(String, Long, Long)].collect()
      .map { case (_, keep, n) => keep -> n }.toMap
    assert(g == Map(0L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("exactDedup drops exact copies, keeps lowest id") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toList == List(0L, 2L, 3L))
  }

  test("exactDedupBagOfWords collapses token permutations byte-exact misses") {
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "gamma alpha beta"),  // permutation of 0 -> dropped
      (2L, "alpha beta"),        // subset, NOT a permutation -> kept
      (3L, "alpha alpha beta"),  // different multiplicity -> kept
      (4L, "alpha beta alpha"),  // permutation of 3 -> dropped
      (5L, "delta")
    ).toDF("doc_id", "text")
    val kept = Dedup.exactDedupBagOfWords(df).select("doc_id").as[Long].collect().sorted
    assert(kept.toList == List(0L, 2L, 3L, 5L))
    // byte-exact keeps everything here (no two rows are byte-equal)
    assert(Dedup.exactDedup(df).count() == 6L)

    // NULL text is ONE group (null-safe key equality, like exactDedup)
    // and never merges with empty text
    val withNulls = Seq((0L, null: String), (1L, ""), (2L, null: String))
      .toDF("doc_id", "text")
    val keptN = Dedup.exactDedupBagOfWords(withNulls)
      .select("doc_id").as[Long].collect().sorted
    assert(keptN.toList == List(0L, 1L))
  }

  test("contaminatedSpans locates the benchmark passage; scrubContamination excises exactly it") {
    val bench = Seq((0L, "what is the capital of france")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "intro words here what is the capital of france closing words after"),
      (2L, "completely unrelated text with no overlap at all whatsoever")
    ).toDF("doc_id", "text")

    // doc 1 tokens: the benchmark phrase occupies positions 3..8; its
    // 5-grams hit at start positions 3 and 4 -> one span [3, 9)
    val spans = Dedup.contaminatedSpans(docs, bench, n = 5)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(spans == List((1L, 3L, 9L, 6L)), s"got $spans")

    val scrubbed = Dedup.scrubContamination(docs, bench, n = 5)
      .orderBy("doc_id").select("text").as[String].collect().toList
    assert(scrubbed == List(
      "intro words here closing words after",
      "completely unrelated text with no overlap at all whatsoever"))
  }

  test("exactDedup/exactDedupCounted match the window-min formulation, including under skew") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // one dominant fingerprint (the 100 TB straggler scenario), a block of
    // unique docs, and many small duplicate groups — spread over partitions
    val hot = (0 until 5000).map(i => (100000L + i, "hot boilerplate page"))
    val uniq = (0 until 500).map(i => (i.toLong, s"unique doc number $i"))
    val dups = (0 until 300).map(i => (10000L + i, s"dup content ${i % 50}"))
    val all = spark.createDataFrame(hot ++ uniq ++ dups).toDF("doc_id", "text")
      .repartition(13)
    val w = Window.partitionBy(TextOps.fingerprint(col("text")))
    val oldKept = all.withColumn("__keep", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("__keep")).drop("__keep")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val newKept = Dedup.exactDedup(all)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(newKept == oldKept)

    val oldCounted = all.withColumn("__keep", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .filter(col("doc_id") === col("__keep")).drop("__keep")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().sorted.toSeq
    val newCounted = Dedup.exactDedupCounted(all)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().sorted.toSeq
    assert(newCounted == oldCounted)
    // n_copies still reconstructs the pre-dedup row count (CorpusCuration)
    assert(newCounted.map(_._2).sum == 5800L)
  }

  test("exactDedup plans as partial aggregate + semi join, never a fingerprint window") {
    val p = Dedup.exactDedup(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"a WindowExec over the fingerprint puts every copy of a hot doc in one task:\n${p.take(900)}")
    assert(p.contains("partial_min"),
      s"keep-id selection must be a partial+final aggregate (map-side combine):\n${p.take(900)}")
    assert(p.contains("LeftSemi"), s"keep set must apply as a semi join:\n${p.take(900)}")
    val pc = Dedup.exactDedupCounted(docs).queryExecution.executedPlan.toString
    assert(!pc.contains("Window") && pc.contains("partial_min"),
      s"counted variant must use the same skew-safe aggregate:\n${pc.take(900)}")
  }

  test("exactDedup groups NULL-text rows together (null-safe key equality)") {
    val withNulls = Seq((1L, null: String), (2L, "x"), (3L, null: String))
      .toDF("doc_id", "text")
    val kept = Dedup.exactDedup(withNulls).select("doc_id").as[Long].collect().sorted
    assert(kept.toList == List(1L, 2L))
  }

  test("signature scan: shingle_set built once per row, projection inside codegen") {
    // a Range-based source: the tiny in-memory fixture constant-folds to
    // a LocalRelation, which erases the very plan this test pins
    import org.apache.spark.sql.functions.{concat_ws, lit}
    val ranged = spark.range(64).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"), lit("beta"), col("id").cast("string"),
        lit("gamma"), lit("delta")).as("text"))
    val sigs = Dedup.minhashSignatureArray(ranged)
    val opt = sigs.queryExecution.optimizedPlan.toString
    assert("shingle_set".r.findAllIn(opt).size == 1,
      s"pushdown duplicated the shingle build into the filter:\n${opt.take(900)}")
    sigs.collect() // AQE finalizes codegen stages only at execution
    val phys = sigs.queryExecution.executedPlan.toString
    val projLine = phys.linesIterator.find(_.contains("minhash_sig")).getOrElse("")
    assert(projLine.contains("*("),
      s"signature projection fell out of whole-stage codegen:\n${phys.take(900)}")
  }

  test("minhashPairs finds identical and near-identical docs, not unrelated ones") {
    val pairs = Dedup.minhashPairs(docs).as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "identical docs must share all bands")
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated docs share no shingle, so no band can match")
  }

  test("maxBucketSize drops a degenerate hot bucket; below the cap results are unchanged") {
    // 40 identical boilerplate docs: every band has one bucket of size 40
    // (k² = 780 pairs per band uncapped); plus one small near-dup pair
    val hot = (100L until 140L).map(i => (i, "the same boilerplate template page text here"))
    val all = (hot ++ Seq((0L, doc), (1L, near))).toDF("doc_id", "text")
    val uncapped = Dedup.minhashPairs(all).as[(Long, Long)].collect().toSet
    assert(uncapped.size >= 780, "hot bucket must emit the quadratic pair set uncapped")
    val capped = Dedup.minhashPairs(all, maxBucketSize = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped == uncapped.filter { case (a, b) => a < 100L && b < 100L },
      "cap must drop exactly the hot bucket's pairs and keep the small pair")
    assert(capped.contains((0L, 1L)))
    // a cap ABOVE every bucket size reproduces the uncapped result exactly
    assert(Dedup.minhashPairs(all, maxBucketSize = 40)
      .as[(Long, Long)].collect().toSet == uncapped)
    // observability: per-band stats report what the cap would discard
    val stats = Dedup.lshBandStats(all, maxBucketSize = 10)
      .select("band", "n_candidate_pairs", "n_dropped_buckets", "n_dropped_pairs")
      .as[(Int, Long, Long, Long)].collect()
    stats.foreach { case (band, _, nDropB, nDropP) =>
      assert(nDropB == 1L, s"band $band: the 40-doc bucket is over the cap")
      assert(nDropP == 780L, s"band $band: 40*39/2 pairs discarded")
    }
    // uncapped diagnostics are cap-independent: dropped counts are zero
    val uncappedStats = Dedup.lshBandStats(all)
      .select("n_dropped_buckets", "n_dropped_pairs").as[(Long, Long)].collect()
    assert(uncappedStats.forall(_ == ((0L, 0L))))
  }

  test("lshBandStats: per-band accounting is consistent with minhashPairs") {
    val stats = Dedup.lshBandStats(docs)
      .select("band", "n_buckets", "n_colliding", "n_candidate_pairs")
      .as[(Int, Long, Long, Long)].collect()
      .map { case (band, nb, nc, np) => band -> ((nb, nc, np)) }.toMap
    assert(stats.keySet == Set(0, 1, 2, 3), "16 hashes / 4 rows = 4 bands")
    // every band partitions the 4 shingled docs into buckets
    stats.values.foreach { case (nBuckets, nColliding, _) =>
      assert(nBuckets >= 1 && nBuckets <= 4)
      assert(nColliding <= nBuckets)
    }
    // docs 0 and 1 are identical -> every band has >=1 colliding bucket
    // emitting >=1 candidate pair
    assert(stats.values.forall { case (_, nc, np) => nc >= 1 && np >= 1 })
    // candidate volume across bands bounds the DISTINCT pair count
    val distinctPairs = Dedup.minhashPairs(docs).count()
    val totalCandidates = stats.values.map(_._3).sum
    assert(totalCandidates >= distinctPairs)
  }

  test("jaccardPairsPrefix equals the brute-force exact join across thresholds") {
    // 40 varied docs: duplicate pairs, near pairs at several overlap
    // levels, and unrelated docs sharing only frequent filler shingles
    val varied = (0L until 40L).map { i =>
      val fam = i % 4
      val words = (0 until 12).map { j =>
        if (j < (i % 7)) s"shared_f${fam}_$j" else s"own_${i}_$j"
      }
      (i, words.mkString(" ") + " common filler tail here")
    }
    val all = varied.toDF("doc_id", "text")
    for (t10 <- Seq(3, 5, 7, 9)) {
      // brute force: every doc pair, exact Jaccard over distinct hashed
      // shingles — the ground truth the prefix filter must reproduce
      val sets = all.select(col("doc_id").as("id"),
        org.apache.spark.sql.functions.array_distinct(
          org.apache.spark.sql.functions.transform(
            TextOps.shingleSet(col("text"), 3),
            s => graft.functions.Hashing.md5Hash32(0, s))).as("hs"))
      val a = sets.select(col("id").as("id_a"), col("hs").as("hs_a"))
      val b = sets.select(col("id").as("id_b"), col("hs").as("hs_b"))
      val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("inter", org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect(col("hs_a"), col("hs_b"))))
        .withColumn("na", org.apache.spark.sql.functions.size(col("hs_a")))
        .withColumn("nb", org.apache.spark.sql.functions.size(col("hs_b")))
        .filter(col("inter") * 10 >= (col("na") + col("nb") - col("inter")) * t10)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val got = Dedup.jaccardPairsPrefix(all, thresholdTenths = t10)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute, s"t=$t10/10: prefix join diverged from brute force")
    }
  }

  test("jaccardPairsPrefix ppm values match jaccardPairs on the shared fixture") {
    val prefix = Dedup.jaccardPairsPrefix(docs, thresholdTenths = 5)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val plain = Dedup.jaccardPairs(docs, threshold = 0.5,
        maxBucketSize = Int.MaxValue)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(prefix == plain)
    assert(prefix((0L, 1L)) == 1000000L)
  }

  test("jaccardPairsPrefix prefix candidates exclude pairs sharing only frequent shingles") {
    // 20 docs all ending in the same viral boilerplate; only docs 0/1
    // truly near-dup. The boilerplate shingles have df=20 (the global
    // maximum), so they sort LAST and stay out of every prefix at t=0.7
    // — no candidate explosion, yet the true pair survives.
    val viral = (0L until 20L).map { i =>
      val own = if (i <= 1) "alpha beta gamma delta epsilon zeta"
        else s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"
      (i, s"$own same viral boilerplate trailer text")
    }.toDF("doc_id", "text")
    val got = Dedup.jaccardPairsPrefix(viral, thresholdTenths = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("jaccardPairs computes exact trigram Jaccard (ppm)") {
    val pairs = Dedup.jaccardPairs(docs, threshold = 0.1)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((0L, 1L)) == 1000000L)
    // doc vs near: 8 shingles each, 7 shared -> floor(7e6/9)
    assert(pairs((0L, 2L)) == 7000000L / 9L)
    assert(!pairs.contains((0L, 3L)))
  }

  test("jaccardPairs maxBucketSize drops the boilerplate shingle, bounds pair volume") {
    // 30 docs that are pairwise unrelated EXCEPT for one shared trigram
    // ("common trigram here") — the boilerplate doc-frequency failure
    // mode: uncapped, that one shingle bucket emits 30·29/2 = 435 pairs
    val hot = (100L until 130L).map(i =>
      (i, s"unique$i token$i filler$i common trigram here"))
    val all = (hot ++ Seq((0L, doc), (2L, near))).toDF("doc_id", "text")
    // each hot doc: 6 tokens -> 4 trigram shingles; jaccard = 1/(4+4-1)
    val uncapped = Dedup.jaccardPairs(all, threshold = 0.1)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(uncapped.count { case ((a, b), _) => a >= 100L && b >= 100L } == 435,
      "uncapped, the shared shingle emits the quadratic pair set")
    assert(uncapped(((0L, 2L))) == 7000000L / 9L)
    // cap below the hot bucket's doc frequency: its 435 pairs vanish
    // (their ONLY shared shingle is dropped); the small pair is intact
    val capped = Dedup.jaccardPairs(all, threshold = 0.1, maxBucketSize = 10)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(capped == uncapped.filter { case ((a, b), _) => a < 100L && b < 100L },
      "cap must drop exactly the hot-shingle pairs and leave (0,2) bit-identical")
    // a cap at-or-above every bucket's doc frequency reproduces uncapped
    assert(Dedup.jaccardPairs(all, threshold = 0.1, maxBucketSize = 30)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap == uncapped)
  }

  test("jaccardPairs cap makes ppm a strict lower bound for pairs straddling a dropped bucket") {
    // docs 50/51 share FOUR shingles, ONE of which ("common trigram
    // here") is also in all 30 hot docs -> its bucket (df=32) drops
    // under cap 10, the other three shared buckets (df=2) survive
    val hot = (100L until 130L).map(i =>
      (i, s"unique$i token$i filler$i common trigram here"))
    val all = (hot ++ Seq(
      (50L, "sharedx alpha beta gamma common trigram here"),
      (51L, "sharedy alpha beta gamma common trigram here"))).toDF("doc_id", "text")
    def ppm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // uncapped: inter=4 of 5+5 shingles -> floor(4e6/6)
    val uncapped = ppm(Dedup.jaccardPairs(all, threshold = 0.1))
    assert(uncapped(((50L, 51L))) == 4000000L / 6L)
    // capped: the hot shingle leaves the INTERSECTION but not the set
    // sizes -> inter=3, union=7: a strict lower bound, pair still present
    val capped = ppm(Dedup.jaccardPairs(all, threshold = 0.1, maxBucketSize = 10))
    assert(capped(((50L, 51L))) == 3000000L / 7L,
      "dropped bucket must shrink inter while na/nb keep counting it")
    assert(capped(((50L, 51L))) < uncapped(((50L, 51L))))
    // consequence: a threshold between the two values drops the pair
    // only under the cap (documented lower-bound semantics)
    assert(ppm(Dedup.jaccardPairs(all, threshold = 0.5)).contains((50L, 51L)))
    assert(!ppm(Dedup.jaccardPairs(all, threshold = 0.5, maxBucketSize = 10))
      .contains((50L, 51L)))
  }

  test("keepCanonicalBy keeps the highest-scoring cluster member, ties to lowest id") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // three byte-identical docs cluster with certainty (all bands match);
    // doc 20 is an unrelated singleton
    val trio = Seq((10L, doc), (11L, doc), (12L, doc), (20L, far))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(trio)
    val favor11 = when(col("doc_id") === 11L, 5L).otherwise(lit(1L))
    val best = Dedup.keepCanonicalBy(trio, pairs, favor11)
      .select("doc_id").as[Long].collect().sorted.toList
    assert(best == List(11L, 20L),
      "cluster {10,11,12} keeps its highest-scoring member 11; singleton 20 survives")
    // tie-break: equal scores -> lowest id, matching keepCanonical
    val tied = Dedup.keepCanonicalBy(trio, pairs, lit(7L))
      .select("doc_id").as[Long].collect().sorted.toList
    assert(tied == List(10L, 20L), "all-equal scores fall back to lowest id")
  }

  test("leakSafeSplit: cluster members share a tag; tag equals splitTag of the label") {
    import org.apache.spark.sql.functions.col
    val ids = (0L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.leakSafeSplit(ids, pairs)
      .as[(Long, Long, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // labels are nearDupClusters' (min reachable id)
    assert(got.view.mapValues(_._1).toMap ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    // every member of a cluster carries the SAME tag, and that tag is
    // splitTag of the label (checked against the scalar on a 1-col frame)
    val tagOf = Seq(0L, 1L, 4L, 5L).map { l =>
      l -> Seq(l).toDF("k")
        .select(Sampling.splitTag(col("k")).as("t")).as[String].head()
    }.toMap
    got.foreach { case (id, (lbl, tag)) =>
      assert(tag == tagOf(lbl), s"doc $id: tag $tag != splitTag($lbl)")
    }
  }

  test("splitLeakageAudit: cluster scheme leaks zero; naive counts straddling pairs") {
    val ids = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.splitLeakageAudit(ids, pairs)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got("cluster")._1 == 4L && got("naive")._1 == 4L)
    assert(got("cluster")._2 == 0L, "cluster-aware split can never straddle a pair")
    assert(got("cluster")._3 == 0L)
    // naive straddles = pairs whose endpoint doc-level tags differ —
    // recompute with the same scalar
    import org.apache.spark.sql.functions.col
    val tags = (0L to 9L).map { i =>
      i -> Seq(i).toDF("k")
        .select(Sampling.splitTag(col("k")).as("t")).as[String].head()
    }.toMap
    val wantLeak = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L))
      .count { case (a, b) => tags(a) != tags(b) }.toLong
    assert(got("naive")._2 == wantLeak)
    assert(got("naive")._3 == (if (wantLeak == 0) 0L else wantLeak * 1000000L / 4L))
  }

  test("simhash: identical docs hash equal; near docs within small hamming") {
    val h = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(h(0L) == h(1L))
    assert(java.lang.Long.bitCount(h(0L) ^ h(3L)) > 0)
    val pairs = Dedup.simhashPairs(docs, maxHamming = 8).as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhash64: independent halves, 16-bit banding, bucket cap bounds the join") {
    val h = Dedup.simhash64(docs).as[(Long, Long)].collect().toMap
    assert(h(0L) == h(1L), "identical docs hash equal")
    assert(java.lang.Long.bitCount(h(0L) ^ h(3L)) > 0)
    // the two 32-bit halves are independent hash draws: the low half must
    // not simply repeat in the high half
    assert((h(3L) >>> 32) != (h(3L) & 0xFFFFFFFFL))
    // low half == the 32-bit simhash (shared seed-0 primitive, by design)
    val h32 = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert((h(3L) & 0xFFFFFFFFL) == h32(3L))
    // pigeonhole: identical docs collide in every band, so (0,1) is found
    // at maxHamming=0 already
    val p0 = Dedup.simhashPairs(docs, maxHamming = 0).as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2)).toSet
    assert(p0.contains((0L, 1L)))
    // a flooded bucket (many identical docs) is dropped by the cap but the
    // small pair survives — join volume is bounded before the a×b join
    val hot = (100L until 130L).map(i => (i, "same boilerplate text again and again"))
    val all = (hot ++ Seq((0L, doc), (1L, doc))).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(all, maxHamming = 3, maxBucketSize = 10)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(capped == Set((0L, 1L)),
      s"hot-bucket pairs must be dropped, the small pair kept: got $capped")
  }

  test("nearDupClusters: min-label connected components; keepCanonical keeps one per cluster") {
    val ids = (0L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val clusters = Dedup.nearDupClusters(ids, pairs).as[(Long, Long)].collect().toMap
    assert(clusters == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    val kept = Dedup.keepCanonical(ids, pairs).select("doc_id").as[Long].collect().sorted
    assert(kept.toList == List(0L, 1L, 4L, 5L))
  }

  private def lssLabels(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ids = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = edges.toDF("id_a", "id_b")
    Dedup.nearDupClustersLSS(ids, pairs).as[(Long, Long)].collect().toMap
  }

  test("nearDupClustersLSS matches both min-label paths on random graphs") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val ids = (0L until n.toLong).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val pairs = edges.toDF("id_a", "id_b")
      val viaLss = Dedup.nearDupClustersLSS(ids, pairs).as[(Long, Long)].collect().toMap
      // driver union-find path (default threshold)
      val viaUf = Dedup.nearDupClusters(ids, pairs).as[(Long, Long)].collect().toMap
      // distributed min-label path (threshold 0 disables the driver path)
      val viaMinLabel = Dedup.nearDupClusters(ids, pairs, driverMaxEdges = 0L,
        maxIterations = 64).as[(Long, Long)].collect().toMap
      assert(viaLss == viaUf, s"trial $trial: LSS vs union-find")
      assert(viaLss == viaMinLabel, s"trial $trial: LSS vs distributed min-label")
    }
  }

  test("nearDupClustersLSS converges in O(log n) rounds on a long path graph") {
    // a 4096-node chain has diameter 4095: min-label propagation would
    // need ~4095 rounds, LSS's 30-round default must label every node 0
    val n = 4096L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val labels = lssLabels(n, chain)
    assert(labels.size == n.toInt)
    assert(labels.values.forall(_ == 0L),
      s"chain must collapse to component min 0; distinct labels: ${labels.values.toSet.take(5)}")
  }

  test("non-converged clustering fails loud instead of returning split components") {
    val ids = (0L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // distributed min-label: diameter 5 cannot converge in 1 round
    intercept[IllegalStateException] {
      Dedup.nearDupClusters(ids, chain, driverMaxEdges = 0L, maxIterations = 1)
    }
    // LSS: a 0-round cap can never reach the star fixed point
    intercept[IllegalStateException] {
      Dedup.nearDupClustersLSS(ids, chain, maxIterations = 0)
    }
  }

  test("nearDupClustersLSS handles cliques, singletons and duplicate/reversed edges") {
    // component {1,2,3} given as a clique with both orientations and dups,
    // component {5,6}, singletons 0 and 4
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (6L, 5L), (6L, 5L))
    val labels = lssLabels(7L, edges)
    assert(labels == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("LSS star steps plan as partial aggregate + join, never a node window") {
    // at the fixed point a component-minimum node's neighborhood IS its
    // whole component — a WindowExec over the node id would buffer it in
    // one task; the groupBy-min + join-back shape must survive planning
    val e = Seq((0L, 1L), (1L, 2L), (0L, 3L), (2L, 5L)).toDF("lo", "hi")
    for ((name, step) <- Seq("largeStar" -> Dedup.largeStarStep(e),
                             "smallStar" -> Dedup.smallStarStep(e))) {
      val p = step.queryExecution.executedPlan.toString
      assert(!p.contains("Window"),
        s"$name: WindowExec over the node serializes a hub's neighborhood into one task:\n${p.take(900)}")
      assert(p.contains("partial_min"),
        s"$name: neighborhood min must be a partial+final aggregate (map-side combine):\n${p.take(900)}")
    }
  }

  test("contamination counts distinct shared n-grams against the benchmark; misses count 0") {
    // benchmark doc = `doc`; corpus: an exact copy (all 6 5-grams hit),
    // a partial overlap (prefix shares some 5-grams), and an unrelated doc
    val bench = Seq((100L, doc)).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, doc),                                          // 6/6 shingles shared
      (1L, "alpha beta gamma delta epsilon zeta QQQ"),    // first 3 of its 3 shingles... shares 2
      (2L, far)                                           // nothing shared
    ).toDF("doc_id", "text")
    val hits = Dedup.contamination(corpus, bench, n = 5)
      .as[(Long, Long)].collect().toMap
    // doc has 10 tokens -> 6 distinct 5-grams, all shared by the copy
    assert(hits(0L) == 6L)
    // doc 1 has 7 tokens -> 3 5-grams, of which the first two appear in doc
    assert(hits(1L) == 2L)
    assert(hits(2L) == 0L)
  }

  test("dedupReport: per-cell dup rates, rollup subtotals reconcile, gid disambiguates") {
    val docs6 = Seq(
      (1L, "same text", "a", "en"),
      (2L, "same text", "a", "en"), // dup of 1 within cell (a, en)
      (3L, "same text", "b", "en"), // dup of 1 across sources
      (4L, "unique one", "a", "de"),
      (5L, "unique two", "b", "en"),
      (6L, null: String, "a", "en") // null text: its own group, not a dup
    ).toDF("doc_id", "text", "source", "lang")
    val got = Dedup.dedupReport(docs6)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2).toInt) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // leaf cells (gid 0)
    assert(got((Some("a"), Some("en"), 0)) == (3L, 1L, 333333L))
    assert(got((Some("b"), Some("en"), 0)) == (2L, 1L, 500000L))
    assert(got((Some("a"), Some("de"), 0)) == (1L, 0L, 0L))
    // per-source subtotal (gid 1) and grand total (gid 3)
    assert(got((Some("a"), None, 1)) == (4L, 1L, 250000L))
    assert(got((None, None, 3)) == (6L, 2L, 333333L))
  }

  test("truncationDupGroups: shared-prefix docs group, longest canonical, shorts excluded") {
    val prefix = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs4 = Seq(
      (1L, s"$prefix cut"), //             9 tokens, truncated copy
      (2L, s"$prefix full version here"), // 11 tokens -> canonical
      (3L, s"$prefix full version here"), // identical length: ties -> min id 2
      (4L, "something else entirely with plenty of extra words"), // unique prefix
      (5L, "short doc") //                 < kPrefix: excluded
    ).toDF("doc_id", "text")
    val got = Dedup.truncationDupGroups(docs4, kPrefix = 8)
      .select("id", "canonical_id", "canonical_n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List((1L, 2L, 11L), (2L, 2L, 11L), (3L, 2L, 11L)))
  }

  test("duplicateSpans finds maximal cross-doc spans; scrub removes exactly those tokens") {
    // 10-token passage shared by docs 1 and 2 at different offsets
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val a = s"intro one two $shared outro three"
    val b = s"$shared completely different ending here"
    val c = "nothing in common with anything else at all"
    val docs3 = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")

    val spans = Dedup.duplicateSpans(docs3, k = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(s => s._1 -> (s._2, s._3)).groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    // doc 1: shared passage = tokens [3, 13); doc 2: [0, 10); doc 3: none
    assert(spans(1L) == List((3L, 13L)), s"doc1 spans: ${spans.get(1L)}")
    assert(spans(2L) == List((0L, 10L)), s"doc2 spans: ${spans.get(2L)}")
    assert(!spans.contains(3L))

    val scrubbed = Dedup.scrubDuplicateSpans(docs3, Dedup.duplicateSpans(docs3, k = 4))
      .as[(Long, String)].collect().toMap
    assert(scrubbed(1L) == "intro one two outro three")
    assert(scrubbed(2L) == "completely different ending here")
    assert(scrubbed(3L) == c)
  }

  test("duplicateSpans: adjacent-but-disjoint duplicated windows stay separate spans") {
    // docs share tokens [0,4) and [5,9) of doc 1 but NOT the bridging
    // token "x", so no k-gram crosses position 4 — two spans, not one
    val docs3 = Seq(
      (1L, "p q r s x t u v w"),
      (2L, "p q r s BREAK1 other words here"),
      (3L, "other BREAK2 t u v w trailing")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs3, k = 4)
      .filter(col("id") === 1L).orderBy("start_tok")
      .as[(Long, Long, Long, Long)].collect().map(s => (s._2, s._3)).toList
    assert(spans == List((0L, 4L), (5L, 9L)), s"got $spans")
  }

  test("duplicateSpans with minDocs=3 acts as a boilerplate detector") {
    val boiler = "this license text appears on every single page footer"
    val docs4 = Seq(
      (1L, s"$boiler unique one"), (2L, s"unique two $boiler"),
      (3L, s"$boiler unique three"), (4L, "independent text no footer at all today")
    ).toDF("doc_id", "text")
    val pair = Dedup.duplicateSpans(docs4, k = 5, minDocs = 2)
    val tri = Dedup.duplicateSpans(docs4, k = 5, minDocs = 3)
    assert(tri.filter(col("id") === 4L).isEmpty)
    // the 3-doc boilerplate survives the stricter threshold in docs 1-3
    assert(tri.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // and minDocs=2 can only widen coverage
    assert(pair.count() >= tri.count())
  }

  test("editDistancePairs: one-token edits provably found, multi-token edits need minhash") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown cat jumps over the dog"),  // substitution
      (3L, "the quick brown fox jumps over the"),      // deletion
      (4L, "a the quick brown fox jumps over the dog"),// insertion
      (5L, "the quick brown fox jumps over the dog"),  // identical to 1
      (6L, "the slow green cat walks under a dog"),    // 2+ token edits vs all
      (7L, "completely unrelated text about databases")
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, maxDist = 10L)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // every <=1-token-edit pair of doc 1 found, each exactly once, exact dist
    assert(pairs((1L, 2L)) == 3L) // fox->cat
    assert(pairs((1L, 3L)) == 4L) // " dog" removed
    assert(pairs((1L, 4L)) == 2L) // "a " inserted
    assert(pairs((1L, 5L)) == 0L) // identical: all sigs shared, ONE pair row
    // multi-token edits are outside the deletion-neighborhood contract
    assert(!pairs.contains((1L, 6L)) && !pairs.contains((6L, 7L)))
    // transitivity of the planted cluster: 2-3, 2-4, 3-4 also within one
    // edit of each other's shared skeleton? only pairs sharing a sig AND
    // within maxDist appear — 2 vs 3 differ by TWO token edits
    assert(!pairs.contains((2L, 3L)))

    // maxDist filters verified candidates: same corpus, tighter budget
    val tight = Dedup.editDistancePairs(docs, maxDist = 2L)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(tight == Set((1L, 4L), (1L, 5L), (4L, 5L)), s"$tight")

    // partition invariance
    val a = Dedup.editDistancePairs(docs, maxDist = 10L)
      .as[(Long, Long, Long)].collect().sorted.toList
    val b = Dedup.editDistancePairs(docs.repartition(5), maxDist = 10L)
      .as[(Long, Long, Long)].collect().sorted.toList
    assert(a == b)
  }

  test("editDistancePairs: bucket cap drops a viral template, leaves the rest intact") {
    import spark.implicits._
    // 50 identical copies of a template + one isolated near-pair
    val docs = ((0L until 50L).map(i => (i, "viral template text repeated everywhere")) ++
      Seq((100L, "rare doc alpha beta gamma"), (101L, "rare doc alpha beta delta"))
    ).toDF("doc_id", "text")
    val capped = Dedup.editDistancePairs(docs, maxDist = 10L, maxBucketSize = 8)
      .as[(Long, Long, Long)].collect()
    // the 50-doc bucket (50*49/2 = 1225 pairs) is dropped entirely...
    assert(!capped.exists(_._1 < 50L), s"viral bucket must be dropped: ${capped.take(5).toSeq}")
    // ...while the small bucket's pair survives with its exact distance
    // (gamma -> delta: 4 substitutions, the final 'a' aligns)
    assert(capped.exists(p => p._1 == 100L && p._2 == 101L && p._3 == 4L),
      s"${capped.toSeq}")
    // uncapped finds the full quadratic set — the shape the cap prevents
    assert(Dedup.editDistancePairs(docs, maxDist = 10L).count() == 1225L + 1L)
  }

  test("semanticDupPairs: subset of exact pairs; equality at nlist=1; dedup keeps canonical") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // threshold low enough that the isotropic fixture yields real pairs
    // (max pairwise cosine in the fixture is ~0.48)
    val th = 0.35
    val exact = pairSet(
      Dedup.embeddingNearDupPairs(emb, threshold = th, exactVerifier = true))
    assert(exact.nonEmpty, "fixture must contain semantic pairs at this threshold")

    // nlist=1: one cluster = the full all-pairs comparison
    assert(pairSet(Dedup.semanticDupPairs(emb, threshold = th, nlist = 1)) == exact)

    // clustered: strict subset semantics (never a false pair), sane recall
    val clustered = pairSet(Dedup.semanticDupPairs(emb, threshold = th, nlist = 8))
    assert(clustered.subsetOf(exact), s"false pairs: ${(clustered -- exact).take(3)}")
    val recall1 = clustered.size.toDouble / exact.size
    // nprobe=2 must not lose pairs vs nprobe=1 and should help boundary recall
    val probed = pairSet(Dedup.semanticDupPairs(emb, threshold = th, nlist = 8, nprobe = 2))
    assert(clustered.subsetOf(probed))
    assert(probed.subsetOf(exact))
    assert(probed.size.toDouble / exact.size >= recall1)

    // end-to-end keep rule: dropped ids are exactly the non-min members of
    // the pair components
    val kept = Dedup.semanticDedup(emb, threshold = th, nlist = 1)
      .select("vec_id").as[Long].collect().toSet
    val exactKept = Dedup.keepCanonical(emb,
      Dedup.embeddingNearDupPairs(emb, threshold = th, exactVerifier = true),
      idCol = "vec_id").select("vec_id").as[Long].collect().toSet
    assert(kept == exactKept)
  }

  test("embeddingNearDupPairs flags high-cosine pairs only") {
    // 3-dim vectors: the banded default folds dim-64 hyperplanes, so the
    // tiny fixture exercises the all-pairs verifier arm explicitly
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, threshold = 0.9,
        exactVerifier = true)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("embeddingNearDupPairs: banded default is a verified subset of the exact pairs") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val th = 0.35
    def pairMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2) -> p._3).toMap
    val exact = pairMap(
      Dedup.embeddingNearDupPairs(emb, threshold = th, exactVerifier = true))
    val banded = pairMap(Dedup.embeddingNearDupPairs(emb, threshold = th))
    assert(exact.nonEmpty, "fixture must contain pairs at this threshold")
    // precision 1: every banded pair is a true pair with the IDENTICAL
    // exact cosine (same double expression on both paths)
    assert(banded.keySet.subsetOf(exact.keySet),
      s"false pairs: ${(banded.keySet -- exact.keySet).take(3)}")
    banded.foreach { case (k, cos) => assert(exact(k) == cos, s"$k cos drift") }
    // the recall trade is real but non-degenerate on the fixture
    assert(banded.nonEmpty, "banded candidates must surface pairs")
  }

  test("containmentPairs: a quoted short doc flags at containment, hides from jaccard") {
    // doc 2 is doc 1's first 12 tokens verbatim (10 trigrams, all inside
    // doc 1's 38); jaccard = 10/38 = 0.26 but containment = 10/10 = 1.0
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val quoted = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, quoted),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, threshold = 0.8)
      .select("id_a", "id_b", "na", "nb", "containment_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(cont == List((1L, 2L, 38L, 10L, 1000000L)), s"got $cont")
    // the same pair is invisible to jaccard at any sane threshold
    val jac = Dedup.jaccardPairs(docs, threshold = 0.5).count()
    assert(jac == 0L)
  }

  test("lshCandidatePrecision: exact-Jaccard verdicts over the banded candidates") {
    // two near-identical docs (one token swapped deep in the text) band
    // together AND clear 0.5 jaccard; the unrelated doc pairs with no one
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("tok30", "tokX")), // 27/31 shared trigrams
      (3L, (1 to 30).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.lshCandidatePrecision(docs)
      .as[(Long, Long, Long)].collect().head
    // exactly the (1,2) candidate, and it verifies true
    assert(r == ((1L, 1L, 1000000L)), s"got $r")
    // cross-check the verdict against jaccardPairs' exact computation
    val exact = Dedup.jaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
  }

  test("blockingEval: completeness and reduction from hand-counted pair sets") {
    // docs 1/2: identical text -> the ONE true pair (jac = 1e6 >= 0.7)
    // and a guaranteed band collision; docs 3/4 unrelated to everything
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),
      (3L, (1 to 30).map(i => s"x$i").mkString(" ")),
      (4L, (1 to 30).map(i => s"y$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.blockingEval(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val (nDocs, total, nCand, nTrue, nFound, compl, red) = r
    assert(nDocs == 4L && total == 6L, s"got $r")
    assert(nTrue == 1L && nFound == 1L && compl == 1000000L, s"got $r")
    // identical docs always collide in every band; unrelated docs may
    // not collide at all -> candidates is at least the true pair
    assert(nCand >= 1L && red == 1000000L - nCand * 1000000L / 6L, s"got $r")
    // cross-check the candidate count against the banded pipeline itself
    val cands = Dedup.minhashPairs(docs).select("id_a", "id_b").count()
    assert(nCand == cands)
  }

  test("MinhashSigFromHashesExpr: bit-parity with the from-text signature " +
    "(dedup/sort invariance) and pair parity on a seeded corpus") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.{Hashing, MinhashSigFromHashesExpr}
    // seeded random corpus with heavy token reuse so shingle MULTISETS
    // repeat within a doc — the exact case where the sets table's
    // array_distinct must not move the signature
    val rnd = new scala.util.Random(77)
    val docs = (1L to 40L).map { i =>
      (i, (1 to 25).map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
    }.toDF("doc_id", "text")
    val fromText = Dedup.minhashSignatureArray(docs)
      .as[(Long, Seq[Long])].collect().toMap
    val (as, bs) = Hashing.minhashParams(16)
    val fromSets = Dedup.shingleHashSets(docs, "doc_id", "text", 3)
      .select(col("id"), ColumnBridge.column(MinhashSigFromHashesExpr(
        ColumnBridge.expression(col("hs")), as, bs)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fromText.keySet == fromSets.keySet)
    fromText.foreach { case (id, sig) =>
      assert(fromSets(id) == sig, s"signature diverged for doc $id")
    }
    // and the banded pair sets agree end to end
    val pairsText = Dedup.minhashPairs(docs)
      .as[(Long, Long)].collect().toSet
    val pairsSets = Dedup.minhashPairsFromSets(
        Dedup.shingleHashSets(docs, "doc_id", "text", 3), 16, 4)
      .as[(Long, Long)].collect().toSet
    assert(pairsText == pairsSets)
  }

  test("jaccardPairs: a bucket over maxBucketSize is dropped exactly, not truncated") {
    // "x y z" lives in all three docs -> bucket size 3 > cap 2 -> dropped
    // from the INTERSECTION counts; docs 1,2 still share three cold
    // trigrams, doc 3 overlaps the others ONLY through the hot shingle
    val docs = Seq(
      (1L, "x y z a b c d"),
      (2L, "x y z a b c e"),
      (3L, "p q x y z r s")).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(docs, threshold = 0.4, maxBucketSize = 2)
      .select("id_a", "id_b", "jaccard_ppm")
      .as[(Long, Long, Long)].collect().toList
    // inter = 3 of the 4 true shared trigrams (hot one excluded);
    // 3·10⁶ / (5 + 5 − 3); the doc-3 pairs vanish entirely
    assert(capped == List((1L, 2L, 3000000L / 7L)), s"got $capped")
    val uncapped = Dedup.jaccardPairs(docs, threshold = 0.4,
        maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b", "jaccard_ppm")
      .as[(Long, Long, Long)].collect().toList
    assert(uncapped == List((1L, 2L, 4000000L / 6L)), s"got $uncapped")
    // the shipped default is the finite scale-safe cap, not ∞
    assert(Dedup.DefaultShingleBucketCap == 1000)
  }

  test("sourceOverlap: containment flags the republishing source pair, disjoint pairs absent") {
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "orig", body),
      (2L, "mirror", body + " extra trailing words here"),   // superset of orig's 5-grams
      (3L, "other", (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs)
      .select("s1", "s2", "shared", "n1", "n2", "containment_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toList
    // orig: 16 distinct 5-grams, all inside mirror's 20 -> containment 1.0
    assert(got == List(("mirror", "orig", 16L, 20L, 16L, 1000000L)), s"got $got")
  }

  test("lshCandidatePrecision: zero candidates is an explicit (0,0,0) row, not NULL") {
    // three pairwise-unrelated docs: no band collides, candidate set empty
    val docs = Seq(
      (1L, (1 to 30).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 30).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 30).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.lshCandidatePrecision(docs)
      .as[(Long, Long, Long)].collect().head
    assert(r == ((0L, 0L, 0L)), s"empty-candidate summary must be defined zeros: $r")
  }

  test("perceptualDupPairs: banding at maxHamming<=3 equals brute-force Hamming") {
    import org.apache.spark.sql.functions.col
    // 36 noise images (12 pattern keys × 3 variants) + one corrupt payload
    val imgs = (0L until 60L).filter(_ % 5 < 3)
      .map(id => id -> graft.ext.Png.syntheticNoise(id)) :+ (999L -> Array[Byte](9))
    val df = imgs.toDF("doc_id", "payload")

    val banded = Dedup.perceptualDupPairs(df)
      .as[(Long, Long, Long)].collect().toSet

    // brute force over the same hashes (pigeonhole: banding loses nothing ≤3)
    val hs = df.select(col("doc_id"), Multimodal.imageDHash(col("payload")).as("h"))
      .filter(col("h").isNotNull).as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb).toLong if d <= 3
    } yield (a, b, d)).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
    assert(banded.forall { case (a, b, _) => a != 999L && b != 999L },
      "undecodable payloads never pair")

    // identical pixels under different containers collide at distance 0
    val twin = Seq(
        (1L, graft.ext.Png.syntheticNoise(10L)),
        (2L, graft.ext.Png.syntheticNoise(10L))).toDF("doc_id", "payload")
    val t = Dedup.perceptualDupPairs(twin).as[(Long, Long, Long)].collect().toList
    assert(t == List((1L, 2L, 0L)), s"got $t")
  }

  test("linkPairs: cross-corpus one-edit links found; within-side pairs never emitted") {
    val a = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact in-side dup: must NOT pair with 1
      (3L, "one two three four five"),
      (4L, "totally different words here")
    ).toDF("doc_id", "text")
    val b = Seq(
      (101L, "alpha beta gamma delta rev"), // one appended token vs 1/2
      (103L, "one two zzz four five"),      // one substituted token vs 3
      (104L, "no relation at all whatsoever")
    ).toDF("doc_id", "text")
    val got = Dedup.linkPairs(a, b, maxDist = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 101L, 4L), (2L, 101L, 4L),  // " rev" = 4 chars
      (3L, 103L, 5L)),                 // three->zzz = 5 char edits
      s"got $got")
    // a tight maxDist filters, never crashes recall below the contract
    val tight = Dedup.linkPairs(a, b, maxDist = 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(tight == Set((1L, 101L, 4L), (2L, 101L, 4L)))
    // cap of 1: the shared template signature bucket drops on the A side
    // (two identical docs emit the same signatures)
    val capped = Dedup.linkPairs(a, b, maxDist = 10L, maxBucketSize = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((3L, 103L, 5L)), s"got $capped")
  }

  test("dupNgramRate: per-doc share of trigrams with corpus df >= 2") {
    // d1/d2 share exactly the trigram "a b c"; d3 shares nothing;
    // d4 is too short for any trigram and is excluded (not a 0-rate row)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c x"), (3L, "z y x2 q w"), (4L, "a b"))
      .toDF("doc_id", "text")
    val got = Dedup.dupNgramRate(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L, 500000L),
      (2L, 2L, 1L, 500000L),
      (3L, 3L, 0L, 0L)), s"got $got")
  }

  test("dupNgramRate: within-doc repeats do not self-count (shingles are a SET)") {
    // "p q r p q r p q r" has distinct trigrams {p q r, q r p, r p q} —
    // each appears once per doc, so a single doc has zero dup exposure
    val docs = Seq((1L, "p q r p q r p q r")).toDF("doc_id", "text")
    val got = Dedup.dupNgramRate(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 0L, 0L)), s"got $got")
  }

  test("dupNgramRate: minDf raises the duplication bar") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    assert(Dedup.dupNgramRate(docs, minDf = 3L)
      .as[(Long, Long, Long, Long)].collect()
      .forall(r => r._3 == 1L && r._4 == 1000000L))
    assert(Dedup.dupNgramRate(docs, minDf = 4L)
      .as[(Long, Long, Long, Long)].collect()
      .forall(r => r._3 == 0L && r._4 == 0L))
  }
}
