package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(0f, 0.9f, 0.1f, 0f)),
    (4L, Array(-1f, 0f, 0f, 0f)),
    (5L, Array(1f, 0f, 0f, 0f)) // exact duplicate of vec 0 (bucket-identical)
  ).toDF("vec_id", "embedding")

  test("topKBruteForce ranks by cosine with deterministic tie-break") {
    val out = SimSearch.topKBruteForce(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // vec 5 is an exact duplicate (cos=1) and outranks vec 1 (cos≈0.994)
    assert(out.map(_._2).toList == List(5L, 1L), s"got ${out.toList}")
    assert(out.head._3 == 1.0)
  }

  test("topKLsh finds the exact-duplicate neighbor (identical bucket by construction)") {
    val out = SimSearch.topKLsh(vecs, vecs.filter(col("vec_id") === 0), k = 2, dim = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2).contains(5L), s"duplicate vector must share the bucket: ${out.toList}")
  }

  test("topKIvf probes centroid lists and reranks exactly") {
    val out = SimSearch.topKIvf(vecs, vecs.filter(col("vec_id") === 0), k = 2, nlist = 2, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.nonEmpty && out.head._2 == 5L)
  }

  test("topKIvfPivots assigns to deterministic pivots and reranks exactly") {
    val out = SimSearch.topKIvfPivots(vecs, vecs.filter(col("vec_id") === 0), k = 2,
      nlist = 2, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // probing every list == exhaustive: the exact duplicate must rank first
    assert(out.nonEmpty && out.head._2 == 5L, s"got ${out.toList}")
  }

  test("topKIvfPivots is deterministic across runs (same pivots, same output)") {
    val q = vecs.filter(col("vec_id") < 2)
    val a = SimSearch.topKIvfPivots(vecs, q, k = 3, nlist = 3, nprobe = 2)
      .collect().map(_.toString).sorted.toList
    val b = SimSearch.topKIvfPivots(vecs, q, k = 3, nlist = 3, nprobe = 2)
      .collect().map(_.toString).sorted.toList
    assert(a == b)
  }

  test("ANN recall@10 floor on the real fixture corpus (q40/q41 parameters)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // 50 query vectors: recall@10 run-to-run spread at nq=5 is wide enough
    // to mask a real regression; 50 stabilizes the mean
    val queries = emb.filter(col("vec_id") < 50)
    def top10(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vid").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val truth = top10(SimSearch.topKBruteForce(emb, queries, k = 10))
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    // The fixture embeddings are isotropic (no cluster structure), so
    // recall tracks candidate-scan fraction: LSH at probeBits=6 scans
    // 7/64 buckets (~11%), IVF at nprobe=8/32 scans ~25%. Measured
    // recall@10 at these params (RecallProbe): LSH 0.23, IVF 0.54 —
    // about 2x the random-scan baseline. The floors sit between measured
    // and baseline, so a parameter/bucketing change that silently
    // degrades retrieval to random-scan quality (LSH ~0.11, IVF ~0.25)
    // FAILS, while ordinary fixture-level variance passes.
    val lsh = recall(top10(SimSearch.topKLsh(emb, queries, k = 10, dim = 64,
      numPlanes = 6, probeBits = 6)))
    val ivf = recall(top10(SimSearch.topKIvfPivots(emb, queries, k = 10,
      nlist = 32, nprobe = 8)))
    assert(lsh >= 0.15, s"LSH recall@10 regressed toward random-scan: $lsh")
    assert(ivf >= 0.40, s"IVF recall@10 regressed toward random-scan: $ivf")
  }

  test("trainIvfCentroidsExact is partition-invariant (integer sums, exact means)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = SimSearch.trainIvfCentroidsExact(emb.repartition(1), nlist = 8, iters = 2)
    val b = SimSearch.trainIvfCentroidsExact(emb.repartition(7), nlist = 8, iters = 2)
    assert(a == b, "centroids must not depend on physical partitioning")
    // Lloyd's must actually move the centroids off the initial pivots
    val pivots = SimSearch.trainIvfCentroidsExact(emb, nlist = 8, iters = 0)
    assert(a != pivots, "2 iterations must update at least one centroid")
  }

  test("topKIvfKmeans finds the exact duplicate and is deterministic") {
    val out = SimSearch.topKIvfKmeans(vecs, vecs.filter(col("vec_id") === 0), k = 2,
      nlist = 2, nprobe = 2, iters = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // probing both of 2 lists == exhaustive: the duplicate must rank first
    assert(out.nonEmpty && out.head._2 == 5L, s"got ${out.toList}")
    val again = SimSearch.topKIvfKmeans(vecs, vecs.filter(col("vec_id") === 0), k = 2,
      nlist = 2, nprobe = 2, iters = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.toList == again.toList)
  }

  test("trainIvfCentroidsExact keeps the previous centroid for emptied clusters") {
    // all six vectors are closer to one pivot after round 1 ⇒ with
    // nlist=2 some cluster may empty; training must still return nlist
    // centroids (COALESCE to the previous generation), never fewer
    val cents = SimSearch.trainIvfCentroidsExact(vecs, nlist = 2, iters = 3)
    assert(cents.size == 2)
    assert(cents.forall(_._2.length == 4))
  }

  test("rrfFuse: integer RRF scores, cross-list agreement wins, single-list items survive") {
    val lex = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("qid", "id", "rnk")
    val sem = Seq((1L, 20L, 1), (1L, 40L, 2)).toDF("qid", "id", "rnk")
    val out = SimSearch.rrfFuse(Seq(lex, sem), topK = 10)
      .orderBy("rank")
      .select("id", "rrf_micro", "n_lists").as[(Long, Long, Long)].collect().toList
    // closed-form: 1e6 div (60 + rnk)
    def c(r: Int) = 1000000L / (60 + r)
    assert(out == List(
      (20L, c(2) + c(1), 2L), // both lists -> top
      (10L, c(1), 1L),
      (40L, c(2), 1L),
      (30L, c(3), 1L)))
  }

  test("hardNegatives excludes same-label and null-label candidates") {
    val labeled = Seq(
      (0L, Array(1f, 0f, 0f, 0f), Integer.valueOf(1)),
      (1L, Array(0.99f, 0.1f, 0f, 0f), Integer.valueOf(1)), // same label: never a negative
      (2L, Array(0.9f, 0.2f, 0f, 0f), Integer.valueOf(2)), // hardest negative
      (3L, Array(0f, 1f, 0f, 0f), Integer.valueOf(2)),
      (4L, Array(0.95f, 0f, 0.1f, 0f), null: Integer) // null label: excluded
    ).toDF("vec_id", "embedding", "label")
    val out = SimSearch.hardNegatives(labeled,
        labeled.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank")
      .select("vid", "neg_label", "rank").as[(Long, Int, Int)].collect().toSeq
    // vec 1 (same label) and vec 4 (null label) must not appear even
    // though both are MORE similar than vec 3
    assert(out == Seq((2L, 2, 1), (3L, 2, 2)))
  }

  test("knnClassify: majority vote, smaller-label tie-break, null labels abstain") {
    val labeled = Seq(
      (0L, Array(1f, 0f, 0f, 0f), Integer.valueOf(9)),   // the query
      (1L, Array(0.99f, 0.1f, 0f, 0f), Integer.valueOf(2)),
      (2L, Array(0.98f, 0.1f, 0f, 0f), Integer.valueOf(2)),
      (3L, Array(0.97f, 0.1f, 0f, 0f), Integer.valueOf(1)),
      (4L, Array(0.96f, 0.1f, 0f, 0f), Integer.valueOf(1)),
      (5L, Array(0.95f, 0.1f, 0f, 0f), null: Integer),   // abstains
      (6L, Array(0f, 1f, 0f, 0f), Integer.valueOf(3))    // outside top-4
    ).toDF("vec_id", "embedding", "label")
    // k=5 neighbors of vec 0 are 1..5; labels {2,2,1,1,null} → 2-2 tie
    // between labels 1 and 2 → smaller label 1 wins
    val got = SimSearch.knnClassify(labeled,
        labeled.filter(col("vec_id") === 0), k = 5)
      .select("qid", "true_label", "pred_label", "votes")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((0L, 9L, 1L, 2L)), s"got $got")
    // raise k to pull in label 3; majority still 1 (votes 2 vs 2 vs 1)
    val got2 = SimSearch.knnClassify(labeled,
        labeled.filter(col("vec_id") === 0), k = 6)
      .select("pred_label", "votes").as[(Long, Long)].collect().head
    assert(got2 == ((1L, 2L)))
  }

  test("VectorOps cosine/dot/l2 compute in double precision") {
    import graft.functions.VectorOps
    val df = Seq((Array(3f, 4f), Array(4f, 3f))).toDF("a", "b")
      .select(
        VectorOps.dot(col("a"), col("b")).as("dot"),
        VectorOps.norm(col("a")).as("na"),
        VectorOps.cosine(col("a"), col("b")).as("cos"),
        VectorOps.l2(col("a"), col("b")).as("l2"))
    val r = df.collect().head
    assert(r.getAs[Double]("dot") == 24.0)
    assert(r.getAs[Double]("na") == 5.0)
    assert(math.abs(r.getAs[Double]("cos") - 24.0 / 25.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("l2") - math.sqrt(2.0)) < 1e-12)
  }

  test("vectorAudit: every defect class counted once, clean rows pass") {
    val rows = Seq(
      (1L, Array(1f, 2f, 3f)),           // clean
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(1f, 2f)),               // wrong dim
      (4L, Array(0f, 0f, 0f)),           // zero vector
      (5L, Array(Float.NaN, 1f, 2f)),    // NaN
      (6L, Array(Float.PositiveInfinity, 1f, 2f))
    ).toDF("vec_id", "embedding")
    val r = SimSearch.vectorAudit(rows, col("embedding"), expectedDim = 3)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r == ((6L, 1L, 1L, 1L, 2L)), s"got $r")
  }

  test("recallAtK: overlap ppm per query, short exact lists, rank cut respected") {
    def list(rows: (Long, Long, Long)*) =
      rows.toDF("qid", "vid", "rank")
    val exact = list((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L)) // boundary query: only one exact neighbor
    val approx = list(
      (1L, 11L, 1L), (1L, 99L, 2L), (1L, 10L, 3L), // 2 of 3, order irrelevant
      (2L, 20L, 1L), (2L, 21L, 2L),                // perfect
      (3L, 31L, 1L),                               // miss
      (3L, 30L, 4L))                               // beyond k -> no credit
    val got = SimSearch.recallAtK(exact, approx, k = 3)
      .select("qid", "n_exact", "n_hit", "recall_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 666666L)))
    assert(got(2L) == ((2L, 2L, 2L, 1000000L)))
    assert(got(3L) == ((3L, 1L, 0L, 0L)))
  }

  test("rankingEval: positional NDCG with the literal discounts, MRR, short lists") {
    def list(rows: (Long, Long, Long)*) = rows.toDF("qid", "vid", "rank")
    val exact = list((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L))
    val approx = list(
      // q1: hits at ranks 1 and 3 -> DCG = w1 + w3; first hit rank 1
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 12L, 3L),
      // q2: perfect order -> NDCG exactly 1e6
      (2L, 20L, 1L), (2L, 21L, 2L),
      // q3: first hit buried at rank 2 of a 1-relevant query
      (3L, 99L, 1L), (3L, 30L, 2L))
    val got = SimSearch.rankingEval(exact, approx, k = 3)
      .as[(Long, Long, Long, Long, Long, Option[Long], Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val Seq(w1, w2, w3) = SimSearch.NdcgWeightsMicro.take(3)
    // q1 AP: hits at 1 (P=1e6) and 3 (P=2e6/3=666666) over min(3,3)
    assert(got(1L) == ((1L, 3L, w1 + w3, w1 + w2 + w3,
      (w1 + w3) * 1000000L / (w1 + w2 + w3), Some(1L), 1000000L,
      (1000000L + 666666L) / 3L)))
    assert(got(2L) == ((2L, 2L, w1 + w2, w1 + w2, 1000000L, Some(1L),
      1000000L, 1000000L)))
    assert(got(3L) == ((3L, 1L, w2, w1, w2 * 1000000L / w1, Some(2L),
      500000L, 500000L)))

    // total miss: zero DCG, no first hit, rr 0, ap 0
    val miss = SimSearch.rankingEval(list((4L, 1L, 1L)),
      list((4L, 9L, 1L)), k = 3)
      .as[(Long, Long, Long, Long, Long, Option[Long], Long, Long)]
      .collect().head
    assert(miss == ((4L, 1L, 0L, w1, 0L, None, 0L, 0L)))
  }

  test("topKPq: integer ADC ranks, self-exclusion, determinism, non-zero recall") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    def run() = SimSearch.topKPq(emb, queries, k = 10)
      .as[(Long, Long, Long, Int)].collect().toList.sortBy(r => (r._1, r._4))
    val got = run()
    assert(got.size == 50, s"5 queries x 10 = ${got.size}")
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._4) == (1 to 10).toList, s"q$qid ranks")
      // integer ADC distances are non-decreasing with rank — no double
      // addition-order lottery can reorder them
      assert(rows.map(_._3) == rows.map(_._3).sorted, s"q$qid adc order")
      assert(!rows.exists(_._2 == qid), s"q$qid must exclude itself")
    }
    assert(run() == got, "PQ search must be deterministic")
    // quantized 4-byte codes still retrieve real neighbors: the PQ
    // top-10 overlaps the exact top-10 somewhere on the fixture
    val exact = SimSearch.topKBruteForce(emb, queries, k = 10)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val overlap = got.map(r => (r._1, r._2)).toSet.intersect(exact)
    assert(overlap.nonEmpty, "PQ must retrieve at least one exact neighbor")
  }

  test("clusterPurity: tie-broken majority, integer purity, labeled mass conserved") {
    // four identical vectors collapse into ONE cell (argmin ties to the
    // smallest cent id); labels split 2-2 -> majority ties to label 1
    val vecs = Seq(
      (1L, Array.fill(8)(1f), Some(1L)),
      (2L, Array.fill(8)(1f), Some(1L)),
      (3L, Array.fill(8)(1f), Some(2L)),
      (4L, Array.fill(8)(1f), Some(2L)),
      (5L, Array.fill(8)(1f), None) // NULL label abstains
    ).toDF("vec_id", "embedding", "label")
    val got = SimSearch.clusterPurity(vecs, nlist = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got == List((1L, 4L, 1L, 2L, 500000L)), s"got $got")
    // fixture-level conservation: labeled vectors all land somewhere
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cells = SimSearch.clusterPurity(emb)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(cells.map(_._2).sum == emb.filter($"label".isNotNull).count())
    cells.foreach { c =>
      assert(c._5 >= 1000000L / 10 && c._5 <= 1000000L, s"purity range: $c")
      assert(c._4 <= c._2)
    }
  }

  test("topKIvfPq: routed candidates carry the SAME ADC distances as the full scan") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val ivfPq = SimSearch.topKIvfPq(emb, queries, k = 10)
      .as[(Long, Long, Long, Int)].collect().toList
    assert(ivfPq.groupBy(_._1).forall(_._2.map(_._4).sorted == (1 to 10).toList),
      "every query fills its k under 8-probe routing on this fixture")
    // the PQ distance of a routed pair is IDENTICAL to the full-scan
    // ADC for that pair — routing changes WHICH pairs are scanned,
    // never their distances (the IVF-PQ contract)
    val fullAdc = SimSearch.topKPq(emb, queries, k = emb.count().toInt)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ivfPq.foreach { case (qid, vid, adc, _) =>
      assert(fullAdc((qid, vid)) == adc, s"($qid,$vid) adc drift")
    }
  }

  test("jlProject: signs replay the md5 parity, components are the exact signed sums") {
    val df = Seq((1L, Array(1.0f, 2.0f, 4.0f))).toDF("vec_id", "embedding")
    val got = SimSearch.jlProject(df, dims = 3, seed = 7)
      .select("jl_proj").as[Seq[Double]].collect().head
    // independent sign recomputation (same convention as Hashing.md5Hash32)
    def sign(j: Int, i: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"7:${j}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 2) * 2 - 1
    }
    val want = (0 until 3).map(j =>
      sign(j, 1) * 1.0 + sign(j, 2) * 2.0 + sign(j, 3) * 4.0)
    assert(got == want, s"got $got want $want")
  }

  test("jlProject: linear map — projection of a sum is the sum of projections") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 3.0f, 0.5f)),
      (2L, Array(2.0f, 1.0f, -1.0f, 4.0f)),
      (3L, Array(3.0f, -1.0f, 2.0f, 4.5f))) // row 3 = row 1 + row 2
      .toDF("vec_id", "embedding")
    val p = SimSearch.jlProject(df, dims = 4)
      .select("vec_id", "jl_proj").as[(Long, Seq[Double])].collect().toMap
    p(1L).zip(p(2L)).zip(p(3L)).foreach { case ((a, b), c) =>
      assert(math.abs(a + b - c) < 1e-9, s"$a + $b != $c")
    }
  }

  test("kCenterCoreset: greedy farthest-point with min-id start and tie-break") {
    // 2-d points on a line: 0, 1, 10, 11, 100. Start = min id (pos 0);
    // farthest is 100 (d2=10000); then 11 beats 10 (min-dist 121 vs 100)
    val emb = Seq(
      (1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(10f, 0f)),
      (4L, Array(11f, 0f)), (5L, Array(100f, 0f)))
      .toDF("vec_id", "embedding")
    val got = SimSearch.kCenterCoreset(emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
    assert(got == List(
      (1L, 1L, None), (2L, 5L, Some(10000.0)), (3L, 4L, Some(121.0))),
      s"got $got")
  }

  test("kCenterCoreset: distance ties break to the smaller id; short corpus stops early") {
    // two points equidistant from the start: id 2 wins the tie
    val emb = Seq((1L, Array(0f)), (2L, Array(5f)), (3L, Array(-5f)))
      .toDF("vec_id", "embedding")
    val got = SimSearch.kCenterCoreset(emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got.take(2) == List((1L, 1L), (2L, 2L)), s"got $got")
    assert(got.size == 3, s"3-row corpus yields 3 centers, got $got")
  }

  test("l2sqDriver: bit-parity with the VectorOps.l2Sq column on random vectors") {
    // kCenterCoresetBatched's certification replays the distributed
    // squared-distance on the driver; if either side ever changes
    // summation order (SIMD, pairwise, the norm expansion) certified
    // picks would silently diverge — this property pin fails loudly
    // next to the cause instead. Random float vectors, exact ==
    // comparison on the accumulated doubles.
    import graft.functions.VectorOps
    val rnd = new scala.util.Random(1717)
    val pairs = (1 to 50).map { i =>
      val d = 1 + rnd.nextInt(40)
      (i.toLong,
        Seq.fill(d)((rnd.nextFloat() - 0.5f) * 1000f),
        Seq.fill(d)((rnd.nextFloat() - 0.5f) * 1000f))
    }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), VectorOps.l2Sq(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    pairs.foreach { case (id, a, b) =>
      val want = SimSearch.l2sqDriver(a.map(_.toFloat), b.map(_.toFloat))
      assert(got(id) == want,
        s"id=$id driver=$want cluster=${got(id)} — summation order diverged")
    }
  }

  test("kCenterCoresetBatched: bit-identical to sequential, passes sub-linear in k") {
    // a deterministic 2-d cloud with repeated points (distance ties) —
    // the shape that forces the certification fallback now and then
    val emb = (1 to 60).map { i =>
      (i.toLong, Array(((i * 13) % 7).toFloat, ((i * 29) % 5).toFloat))
    }.toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
    for (k <- Seq(1, 3, 12)) {
      val seqr = rows(SimSearch.kCenterCoreset(emb, k))
      val (bdf, passes) =
        SimSearch.kCenterCoresetBatchedWithStats(emb, k, 8, "vec_id", "embedding")
      assert(rows(bdf) == seqr, s"k=$k")
      // tie-heavy worst case may fall back often, but never BELOW the
      // sequential job count's improvement floor (>= 1 pick per pass)
      assert(passes < math.max(k, 2), s"k=$k passes=$passes")
    }
    // distinct-distance cloud: certification succeeds and the job count
    // is ~k/batch, the designed sub-linear regime
    val spread = (1 to 60).map(i => (i.toLong, Array((i * i).toFloat)))
      .toDF("vec_id", "embedding")
    val seqr = rows(SimSearch.kCenterCoreset(spread, 12))
    val (bdf, passes) =
      SimSearch.kCenterCoresetBatchedWithStats(spread, 12, 8, "vec_id", "embedding")
    assert(rows(bdf) == seqr)
    // ~2-3 certified picks per pass on spread data (see scaladoc):
    // strictly fewer jobs than the k-1 sequential scans
    assert(passes <= 1 + 12 / 2, s"passes=$passes on the distinct cloud")
    // short corpus + k past exhaustion, batch=1 degenerates to sequential
    val tiny = Seq((1L, Array(0f)), (2L, Array(5f)), (3L, Array(-5f)))
      .toDF("vec_id", "embedding")
    assert(rows(SimSearch.kCenterCoresetBatched(tiny, 5, batch = 1)) ==
      rows(SimSearch.kCenterCoreset(tiny, 5)))
  }

  test("jlProject: seeds decorrelate — different seed, different signs somewhere") {
    val df = Seq((1L, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val a = SimSearch.jlProject(df, dims = 8, seed = 7)
      .select("jl_proj").as[Seq[Double]].collect().head
    val b = SimSearch.jlProject(df, dims = 8, seed = 8)
      .select("jl_proj").as[Seq[Double]].collect().head
    assert(a != b)
  }
}
