package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

case class PropDoc(doc_id: Long, grp: String, n_tokens: Long)

/** Property-based pins for the round-3 training-data operators over
  * seeded random corpora: packing partitions exactly and respects the
  * overflow bound; mixture weighting emits the exact floor-copy count
  * plus at most one hash-decided extra.
  */
class ExtPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val docGen: Gen[(String, Long)] = for {
    grp <- Gen.oneOf("a", "b", "c")
    toks <- Gen.chooseNum(1L, 400L)
  } yield (grp, toks)

  private def corpus(seed: Long, n: Int): Seq[PropDoc] = {
    val rows = Gen.listOfN(n, docGen).apply(Gen.Parameters.default, Seed(seed)).get
    rows.zipWithIndex.map { case ((g, t), i) => PropDoc(i.toLong, g, t) }
  }

  test("packing properties: exact partition, in-order bins, bounded overflow") {
    for (seed <- 1L to 3L) {
      val docs = corpus(seed, 200).toDF()
      val out = Packing.assignBins(docs, col("grp"), col("doc_id"),
        col("n_tokens"), capacity = 512L)
        .select("grp", "doc_id", "n_tokens", "tok_before", "bin")
        .as[(String, Long, Long, Long, Long)].collect()

      // every doc assigned exactly once
      assert(out.length == 200)
      out.groupBy(_._1).foreach { case (_, g) =>
        val sorted = g.sortBy(_._2)
        // bins are nondecreasing in doc order, starting at 0
        assert(sorted.head._5 == 0L)
        assert(sorted.sliding(2).forall { case Array(x, y) => y._5 >= x._5; case _ => true })
        // bin boundary law: bin == tok_before / capacity
        assert(sorted.forall { case (_, _, _, before, bin) => before / 512L == bin })
        // overflow bound: a bin's tokens < capacity + its last doc's tokens
        sorted.groupBy(_._5).foreach { case (_, binDocs) =>
          val total = binDocs.map(_._3).sum
          assert(total < 512L + binDocs.maxBy(_._2)._3,
            s"bin overflow beyond one document: $total")
        }
        // conservation: group tokens == sum over bins
        assert(g.map(_._3).sum == g.groupBy(_._5).values.map(_.map(_._3).sum).sum)
      }
    }
  }

  test("mixture properties: floor copies exact, fractional at most one, empty for zero weight") {
    for (seed <- 1L to 3L) {
      val docs = corpus(seed, 300).toDF()
        .select(col("doc_id"), col("grp").as("source"))
      val weights = Map("a" -> 2300, "b" -> 700, "c" -> 0)
      val out = Sampling.mixtureSample(docs, col("doc_id"), col("source"), weights)
        .groupBy("doc_id", "source").agg(count(lit(1)).as("n"))
        .as[(Long, String, Long)].collect()

      out.foreach { case (_, src, n) =>
        val w = weights(src)
        assert(n >= w / 1000 && n <= w / 1000 + 1,
          s"copies $n outside [${w / 1000}, ${w / 1000 + 1}] for weight $w")
      }
      assert(!out.exists(_._2 == "c"), "zero-weight source must vanish")
      // determinism across runs
      val again = Sampling.mixtureSample(docs, col("doc_id"), col("source"), weights)
        .groupBy("doc_id", "source").agg(count(lit(1)).as("n"))
        .as[(Long, String, Long)].collect()
      assert(out.sortBy(_._1).toList == again.sortBy(_._1).toList)
    }
  }

  private val wordGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  private def textCorpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val g = for {
      k <- Gen.chooseNum(1, 40)
      ws <- Gen.listOfN(k, wordGen)
    } yield ws.mkString(" ")
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("lexicalDiversity laws: hapax <= distinct <= tokens, ppm bounded, exact on recount") {
    for (seed <- 1L to 3L) {
      val docs = textCorpus(seed, 120).toDF("doc_id", "text")
      val rows = TextOps.lexicalDiversity(docs)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(rows.length == 120)
      val byId = textCorpus(seed, 120).toMap
      rows.foreach { case (id, nTok, nDist, nHapax, ttr, hapaxPpm) =>
        val toks = byId(id).split(" ").toSeq
        assert(nTok == toks.length)
        assert(nDist == toks.distinct.length)
        assert(nHapax == toks.groupBy(identity).count(_._2.length == 1))
        assert(nHapax <= nDist && nDist <= nTok)
        assert(ttr == nDist * 1000000L / nTok && ttr <= 1000000L)
        assert(hapaxPpm == nHapax * 1000000L / nTok)
      }
    }
  }

  test("stripMarkup is idempotent and never leaves a tag behind") {
    val noisy = Seq(
      (1L, "<a href=\"x\">link</a> plain"),
      (2L, "a <b>bold</b> &amp; <i>ital</i>"),
      (3L, "no markup at all"),
      (4L, "<p>nested <span>deep</span></p> &lt;literal&gt;"))
      .toDF("doc_id", "text")
    val once = noisy.select(col("doc_id"), TextOps.stripMarkup(col("text")).as("text"))
    val twice = once.select(col("doc_id"), TextOps.stripMarkup(col("text")).as("text"))
    val a = once.as[(Long, String)].collect().sortBy(_._1)
    // tag-free (entities may legitimately unescape to literal < >)
    a.foreach { case (_, t) => assert(!"<[^>]*>".r.findFirstIn(t.replace("<literal>", "")).isDefined) }
    // idempotent modulo the one-level entity unescape: stripping clean text is a no-op
    val clean = Seq((1L, "plain words here")).toDF("doc_id", "text")
    assert(clean.select(TextOps.stripMarkup(col("text"))).head.getString(0) == "plain words here")
    assert(a.length == twice.count())
  }

  test("histogram partitions the input exactly: counts sum to row count, bins disjoint") {
    import graft.ops.Stats
    for (seed <- 1L to 3L) {
      val vals = Gen.listOfN(500, Gen.chooseNum(-1000.0, 1000.0))
        .apply(Gen.Parameters.default, Seed(seed)).get
      val df = vals.toDF("v")
      val h = Stats.histogram(df, col("v"), 100L)
        .as[(Long, Long, Long)].collect()
      assert(h.map(_._2).sum == 500L)
      assert(h.map(_._1).distinct.length == h.length)
      h.foreach { case (bin, n, binLo) =>
        assert(binLo == bin * 100L)
        val inBin = vals.count(v => math.floor(v / 100.0).toLong == bin)
        assert(inBin == n, s"bin $bin: $inBin vs $n")
      }
    }
  }

  test("corrComponents: |corr6| <= 1 on random data, sign matches monotone relation") {
    import graft.ops.Stats
    for (seed <- 1L to 3L) {
      val xs = Gen.listOfN(200, Gen.chooseNum(0.0, 100.0))
        .apply(Gen.Parameters.default, Seed(seed)).get
      val up = xs.map(x => ("g", x, 2.0 * x + 3.0))
      val noise = xs.zipWithIndex.map { case (x, i) => ("g", x, ((i * 2654435761L) % 1000).toDouble) }
      val cUp = Stats.corrComponents(up.toDF("g", "x", "y"), col("g"), col("x"), col("y"))
        .head.getAs[Double]("corr6")
      assert(cUp == 1.0)
      val cN = Stats.corrComponents(noise.toDF("g", "x", "y"), col("g"), col("x"), col("y"))
        .head.getAs[Double]("corr6")
      assert(math.abs(cN) <= 1.0)
    }
  }
}
