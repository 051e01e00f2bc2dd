package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Top-level so Spark can generate its encoder (inner classes can't). */
case class BDoc(doc_id: Long, score: Long, tok: Long)

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (0L until 2000L).map { i =>
    (i, s"src${(i % 4)}")
  }.toDF("doc_id", "source")

  test("hashSample keeps roughly the requested fraction, deterministically") {
    val a = Sampling.hashSample(corpus, col("doc_id"), fractionBp = 1000)
      .select("doc_id").as[Long].collect().sorted.toList
    val b = Sampling.hashSample(corpus, col("doc_id"), fractionBp = 1000)
      .select("doc_id").as[Long].collect().sorted.toList
    assert(a == b, "hash sampling must be reproducible")
    assert(a.size > 130 && a.size < 270, s"~10% of 2000 expected, got ${a.size}")
  }

  test("mixtureSample: integer weight part is exact, fractional part is hash-decided") {
    val out = Sampling.mixtureSample(corpus, col("doc_id"), col("source"),
      Map("src0" -> 2500, "src1" -> 500, "src2" -> 0), defaultMilli = 1000)
      .groupBy("source").agg(count(lit(1)).as("n"), max(col("copy")).as("maxc"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // src0 (500 docs, 2.5x): every doc emits >= 2 copies, ~half emit 3
    val (n0, max0) = out("src0")
    assert(max0 == 3L)
    assert(n0 >= 1000L && n0 <= 1500L, s"2.5x of 500 docs in [1000,1500], got $n0")
    assert(n0 > 1150L && n0 < 1350L, s"~1250 expected, got $n0")
    // src1 (0.5x): subsample, no doc repeated
    val (n1, max1) = out("src1")
    assert(max1 == 1L)
    assert(n1 > 180L && n1 < 320L, s"~250 of 500 expected, got $n1")
    // src2 (0x): dropped entirely
    assert(!out.contains("src2"))
    // src3 unlisted -> defaultMilli 1000 -> exactly one copy each
    assert(out("src3") == (500L, 1L))
  }

  test("capPerKey keeps exactly n per key, deterministically, partition-invariant") {
    val capped = Sampling.capPerKey(corpus, col("source"), col("doc_id"), n = 7)
    val perKey = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perKey.values.toSet == Set(7L), s"every 500-doc source capped to 7: $perKey")

    val a = capped.select("doc_id").as[Long].collect().sorted.toList
    val b = Sampling.capPerKey(corpus.repartition(17), col("source"), col("doc_id"), n = 7)
      .select("doc_id").as[Long].collect().sorted.toList
    assert(a == b, "kept set must not depend on input partitioning")

    // under-cap keys pass through whole
    val tiny = corpus.filter(col("doc_id") < 20)
    assert(Sampling.capPerKey(tiny, col("source"), col("doc_id"), n = 7).count() == 20L)
  }

  test("capPerKey selection is hash-uniform, not an id prefix") {
    val kept = Sampling.capPerKey(corpus, col("source"), col("doc_id"), n = 100)
      .filter(col("source") === "src0").select("doc_id").as[Long].collect()
    // of src0's 500 docs (ids ≡ 0 mod 4, up to 1996), a uniform 100-draw
    // should straddle the id range, not cluster at the low end
    assert(kept.count(_ < 1000L) > 20 && kept.count(_ >= 1000L) > 20,
      s"hash order must spread across the id range: low=${kept.count(_ < 1000L)}")
  }

  test("capPerKey plans as a partial WindowGroupLimit before the key shuffle") {
    val capped = Sampling.capPerKey(corpus, col("source"), col("doc_id"), n = 7)
    capped.collect()
    val p = capped.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=n must trigger InferWindowGroupLimit:\n${p.take(800)}")
    assert(p.contains("Partial"),
      "the limit must prune map-side BEFORE the key shuffle — that bound is the operator's skew story")
  }

  test("weightedPrioritySamplePerKey: exact k per stratum, weight tilt inside each") {
    // two strata; weights tilt 100:1 toward half the ids WITHIN each
    // stratum (source = id mod 4, so id parity is constant per stratum —
    // tilt on (id div 4) parity instead)
    def heavy(id: Long) = (id / 4) % 2 == 0
    val weighted = corpus.filter(col("source").isin("src0", "src1"))
      .withColumn("weight_ppm",
        when((col("doc_id") / 4).cast("long") % 2 === 0, 1000000L)
          .otherwise(10000L))
    val kept = Sampling.weightedPrioritySamplePerKey(weighted,
      col("source"), col("doc_id"), col("weight_ppm"), k = 50)
      .select("source", "doc_id").as[(String, Long)].collect()
    val bySrc = kept.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(bySrc.keySet == Set("src0", "src1"))
    assert(bySrc.values.forall(_.length == 50), "exactly k per stratum")
    // the 100x weight advantage must dominate each stratum's draw
    bySrc.foreach { case (src, ids) =>
      assert(ids.count(heavy) >= 40,
        s"$src: heavy items should dominate, got ${ids.count(heavy)}/50")
    }
    // determinism
    val again = Sampling.weightedPrioritySamplePerKey(weighted,
      col("source"), col("doc_id"), col("weight_ppm"), k = 50)
      .select("source", "doc_id").as[(String, Long)].collect()
    assert(kept.sorted.toList == again.sorted.toList)
  }

  test("weightedPrioritySamplePerKey plans as a partial WindowGroupLimit") {
    val weighted = corpus.withColumn("weight_ppm", lit(500000L))
    val sampled = Sampling.weightedPrioritySamplePerKey(weighted,
      col("source"), col("doc_id"), col("weight_ppm"), k = 5)
    sampled.collect()
    val p = sampled.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k must trigger InferWindowGroupLimit:\n${p.take(800)}")
    assert(p.contains("Partial"),
      "the limit must prune map-side BEFORE the key shuffle")
  }

  test("mixtureSample copies are indexed 1..n for downstream spreading") {
    val copies = Sampling.mixtureSample(corpus.filter(col("source") === "src0"),
      col("doc_id"), col("source"), Map("src0" -> 3000))
      .groupBy("doc_id").agg(collect_list(col("copy")).as("cs"))
      .select("cs").as[Seq[Long]].collect()
    copies.foreach(cs => assert(cs.sorted == Seq(1L, 2L, 3L)))
  }

  // 1600 docs of src0 + 100 each of src1..src4: isqrt = (40,10,10,10,10),
  // sum_s = 80, total = 2000 -> closed-form weights 625 / 2500
  private def skewed = (0L until 2000L).map { i =>
    (i, if (i < 1600L) "src0" else s"src${1 + ((i - 1600) / 100)}")
  }.toDF("doc_id", "source")

  test("temperatureMilliWeights: closed-form isqrt weights, exact integers") {
    val w = Sampling.temperatureMilliWeights(skewed, col("source"))
      .as[(String, Long)].collect().toMap
    assert(w("src0") == 625L, s"1000*40*2000/(1600*80): $w")
    assert((1 to 4).forall(i => w(s"src$i") == 2500L), s"1000*10*2000/(100*80): $w")
  }

  test("temperatureResample: head flattened, tail boosted, total size preserved") {
    val out = Sampling.temperatureResample(skewed, col("doc_id"), col("source"))
    val perSrc = out.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // src0 expected 1600*0.625 = 1000; tail 100*2.5 = 250 each; hash noise
    assert(perSrc("src0") > 900L && perSrc("src0") < 1100L, s"$perSrc")
    (1 to 4).foreach { i =>
      assert(perSrc(s"src$i") >= 200L && perSrc(s"src$i") <= 300L, s"$perSrc")
    }
    val total = perSrc.values.sum
    assert(total > 1800L && total < 2200L,
      s"expected corpus size preserved (~2000), got $total")

    // deterministic and partition-invariant
    val a = out.select("doc_id", "copy").as[(Long, Long)].collect().sorted.toList
    val b = Sampling.temperatureResample(skewed.repartition(13), col("doc_id"), col("source"))
      .select("doc_id", "copy").as[(Long, Long)].collect().sorted.toList
    assert(a == b)
  }

  test("temperatureResample: null source keys group and join null-safely") {
    val withNull = (0L until 100L).map(i =>
      (i, if (i % 10 == 0) null else "srcA")).toDF("doc_id", "source")
    val out = Sampling.temperatureResample(withNull, col("doc_id"), col("source"))
    // 10 null-source docs form their OWN weight bucket (upsampled vs the
    // 90-doc srcA head), not silently dropped by an inner equi-join
    val nullRows = out.filter(col("source").isNull).count()
    assert(nullRows > 0L, "null-source rows must survive the weight join")
  }

  /** JVM twin of Hashing.md5Hash32: uint32 from md5("<seed>:<s>"). */
  private def md5h32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)

  /** The naive single-ordering greedy the operator must reproduce. */
  private def greedyOracle(docs: Seq[BDoc], budget: Long, seed: Int): Set[Long] = {
    val hashed = docs.map(d => (d, md5h32(s"$seed:${d.doc_id}")))
      .sortBy { case (d, h) => (-d.score, h, d.doc_id) }
    var spent = 0L
    val kept = Seq.newBuilder[Long]
    hashed.foreach { case (d, _) =>
      if (spent < budget) { kept += d.doc_id; spent += d.tok }
    }
    kept.result().toSet
  }

  test("selectTokenBudget matches the global greedy ordering row-for-row") {
    // few score classes with many members each -> exercises full-keep,
    // boundary, and full-drop classes; ties broken by hash inside a class
    val docs = (0L until 600L).map(i => BDoc(i, 100L - (i % 6), 10L + i % 7))
    val df = docs.toDF()
    val kept = Sampling.selectTokenBudget(df, col("doc_id"), col("score"),
        col("tok"), budget = 2000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == greedyOracle(docs, 2000L, seed = 5))

    // structural check: at least one class is PARTIALLY kept (the
    // boundary class got per-document decisions, not a class verdict)
    val perScoreKept = docs.groupBy(_.score).map { case (s, ds) =>
      s -> ds.count(d => kept.contains(d.doc_id)) }
    assert(perScoreKept.values.exists(n => n > 0 && n < 100),
      s"expected a partially-kept boundary class: $perScoreKept")
  }

  test("selectTokenBudget edges: zero budget, over-budget, zero-token docs") {
    val docs = (0L until 50L).map(i => BDoc(i, i % 3, if (i % 5 == 0) 0L else 4L))
    val df = docs.toDF()
    assert(Sampling.selectTokenBudget(df, col("doc_id"), col("score"),
      col("tok"), budget = 0L).count() == 0L)
    assert(Sampling.selectTokenBudget(df, col("doc_id"), col("score"),
      col("tok"), budget = 1000000L).count() == 50L)
    val kept = Sampling.selectTokenBudget(df, col("doc_id"), col("score"),
        col("tok"), budget = 37L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == greedyOracle(docs, 37L, seed = 5))
  }

  test("selectTokenBudgetPerKey: independent per-stratum greedy, default budget applies") {
    val docs = (0L until 600L).map(i => BDoc(i, 50L - (i % 5), 6L + i % 4))
    val strata = (i: Long) => s"lang${i % 3}"
    val df = docs.toDF().withColumn("lang",
      concat(lit("lang"), col("doc_id") % 3))
    val budgets = Map("lang0" -> 300L, "lang1" -> 150L)
    val kept = Sampling.selectTokenBudgetPerKey(df, col("doc_id"), col("lang"),
        col("score"), col("tok"), budgets, defaultBudget = 450L)
      .select("doc_id").as[Long].collect().toSet
    // per-stratum naive greedy, each with its own budget
    val expected = docs.groupBy(d => strata(d.doc_id)).flatMap { case (k, ds) =>
      val b = budgets.getOrElse(k, 450L)
      greedyOracle(ds.toSeq, b, seed = 5)
    }.toSet
    assert(kept == expected)
    // every stratum selected SOMETHING and respected ITS budget
    (0 to 2).foreach { s =>
      val mine = docs.filter(d => d.doc_id % 3 == s && kept.contains(d.doc_id))
      val b = budgets.getOrElse(s"lang$s", 450L)
      assert(mine.nonEmpty)
      assert(mine.map(_.tok).sum < b + docs.map(_.tok).max,
        s"stratum lang$s overshot its budget")
    }
  }

  test("selectTokenBudgetPerKey: null strata budget as their own stratum, never dropped") {
    val df = (0L until 90L).map(i => (i, if (i % 3 == 0) null else s"k${i % 3}"))
      .toDF("doc_id", "strata")
      .withColumn("score", col("doc_id") % 5)
      .withColumn("tok", lit(4L))
    val kept = Sampling.selectTokenBudgetPerKey(df, col("doc_id"), col("strata"),
        col("score"), col("tok"), budgets = Map.empty, defaultBudget = 40L)
      .select("doc_id", "strata").collect()
    // each of the three strata (incl. null) fills its own 40-token budget:
    // 10 docs of 4 tokens each, with the boundary doc overshoot rule
    val perStrata = kept.groupBy(r => Option(r.getString(1))).view.mapValues(_.length).toMap
    assert(perStrata.keySet == Set(None, Some("k1"), Some("k2")),
      s"null stratum must survive: $perStrata")
    perStrata.foreach { case (k, n) =>
      assert(n == 10, s"stratum $k: 40-token budget = 10 four-token docs, got $n")
    }
  }

  test("selectTokenBudget is partition-invariant and budget-bounded") {
    val docs = (0L until 500L).map(i => BDoc(i, i % 11, 3L + i % 13))
    val df = docs.toDF()
    val a = Sampling.selectTokenBudget(df, col("doc_id"), col("score"),
      col("tok"), budget = 900L).select("doc_id").as[Long].collect().sorted.toList
    val b = Sampling.selectTokenBudget(df.repartition(19), col("doc_id"), col("score"),
      col("tok"), budget = 900L).select("doc_id").as[Long].collect().sorted.toList
    assert(a == b)
    val keptTok = docs.filter(d => a.contains(d.doc_id)).map(_.tok).sum
    val maxTok = docs.map(_.tok).max
    assert(keptTok < 900L + maxTok,
      s"greedy may overshoot by at most one document: $keptTok")
    assert(keptTok >= 900L - maxTok || a.size == docs.size,
      s"budget must be nearly exhausted: $keptTok")
  }

  test("weightedPrioritySample: weight tilts selection, exact k, null/zero excluded, deterministic") {
    // 500 heavy (weight 1e6) + 500 light (weight 1e4, 100x less) + bad rows
    val rows = (0L until 500L).map(i => (i, Some(1000000L))) ++
      (500L until 1000L).map(i => (i, Some(10000L))) ++
      Seq((1000L, Some(0L)), (1001L, None: Option[Long]))
    val df = rows.toDF("doc_id", "weight_ppm")
    val take = Sampling.weightedPrioritySample(df, col("doc_id"), col("weight_ppm"), k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(take.size == 100, "exactly k rows")
    assert(!take.contains(1000L) && !take.contains(1001L), "zero/null weights never sample")
    val heavy = take.count(_ < 500L)
    // E[heavy] with a 100:1 weight ratio is ~99; even a loose bound
    // separates it from the unweighted expectation of 50
    assert(heavy > 80, s"heavy-weight rows must dominate the sample: $heavy/100")
    val again = Sampling.weightedPrioritySample(
        df.repartition(7), col("doc_id"), col("weight_ppm"), k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(again == take, "selection is partition-invariant")
  }

  test("negativeSamples: never a positive, deterministic, ranked, k-capped") {
    // 20 items, 3 users with disjoint-ish positives
    val pos = Seq(
      1L -> 100L, 1L -> 101L, 1L -> 102L,
      2L -> 110L, 2L -> 111L,
      3L -> 119L
    ).map { case (u, i) => (u, i) } ++ (100L to 119L).map(i => (9L, i))
    val df = pos.toDF("u", "i")
    val got = Sampling.negativeSamples(df, "u", "i", k = 3)
      .as[(Long, Long, Long)].collect().toList
    val posSet = pos.toSet
    assert(got.forall { case (u, i, _) => !posSet.contains((u, i)) },
      s"a negative hit a positive: $got")
    // per-user: ranks are 1..k dense, k respected
    val byUser = got.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toList, s"user $u: $rows")
      assert(rows.size <= 3)
    }
    assert(byUser.keySet.contains(1L) && byUser.keySet.contains(2L) &&
      byUser.keySet.contains(3L))
    // user 9 holds EVERY item: zero negatives exist, none fabricated
    assert(!byUser.contains(9L), "full-universe user must get no negatives")
    // deterministic under repartitioning
    val again = Sampling.negativeSamples(df.repartition(5), "u", "i", k = 3)
      .as[(Long, Long, Long)].collect().toList
    assert(again.toSet == got.toSet)
  }

  test("proportionalAllocation: quotas sum to min(budget, N) exactly; extras go to largest remainders") {
    // strata sizes 5/3/2 with budget 7: floors 3/2/1 (sum 6), remainders
    // 5/1/4 -> the single extra goes to "a"
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("s")
    val out = Sampling.proportionalAllocation(df, col("s"), budget = 7L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(out.values.sum == 7L)

    // budget >= N saturates every stratum at its population
    val all = Sampling.proportionalAllocation(df, col("s"), budget = 100L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(all == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))

    // budget 0 allocates nothing
    val none = Sampling.proportionalAllocation(df, col("s"), budget = 0L)
      .as[(String, Long, Long)].collect().map(_._3).sum
    assert(none == 0L)
  }

  test("allocatedSample draws exactly the quotas, deterministically, partition-invariant") {
    val df = (1 to 50).map(i => (if (i <= 35) "a" else "b", i.toLong))
      .toDF("s", "id")
    val out = Sampling.allocatedSample(df, col("s"), col("id"), budget = 10L)
      .as[(String, Long)].collect()
    val byStratum = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byStratum == Map("a" -> 7, "b" -> 3)) // 35/50*10=7, 15/50*10=3
    assert(out.length == 10)
    // deterministic under repartitioning
    val again = Sampling.allocatedSample(df.repartition(7), col("s"),
      col("id"), budget = 10L).as[(String, Long)].collect()
    assert(again.toSet == out.toSet)
    // sampled ids are a subset of the population
    assert(out.forall { case (s, id) => (s == "a") == (id <= 35) })
  }
}
