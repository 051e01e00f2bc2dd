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
}
