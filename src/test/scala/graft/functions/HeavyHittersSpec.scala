package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(tokens: Seq[String], k: Int): Map[String, Long] =
    tokens.toDS().select(HeavyHitters(k).toColumn.name("hh"))
      .head().toMap

  test("every item above n/(k+1) is found, counts underestimate by at most n/(k+1)") {
    for (seed <- 1L to 3L) {
      val n = 5000
      val k = 9
      // skewed corpus: "hot" is ~30% of the stream, rest spread over 200 tokens
      val gen = Gen.frequency(
        3 -> Gen.const("hot"),
        1 -> Gen.const("warm"),
        6 -> Gen.chooseNum(0, 199).map(i => s"cold$i"))
      val tokens = Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(seed)).get
      val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = sketch(tokens, k)
      val slack = n.toLong / (k + 1)
      exact.foreach { case (t, c) =>
        if (c > slack) {
          assert(got.contains(t), s"heavy item $t (count $c > $slack) missing")
          assert(got(t) <= c && got(t) >= c - slack,
            s"$t: reported ${got(t)} vs exact $c (slack $slack)")
        }
      }
      assert(got.size <= k)
    }
  }

  test("the guarantee is partition-invariant (merge path)") {
    val tokens = (1 to 3000).map(i => if (i % 3 == 0) "big" else s"t${i % 50}")
    val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 13)) {
      val got = tokens.toDS().repartition(parts)
        .select(HeavyHitters(9).toColumn.name("hh"))
        .head().toMap
      val slack = tokens.size.toLong / 10
      assert(got.contains("big"), s"parts=$parts lost the heavy item")
      assert(got("big") >= exact("big") - slack && got("big") <= exact("big"))
    }
  }

  test("a uniform stream yields no spurious confident counts") {
    val tokens = (1 to 1000).map(i => s"u${i % 100}") // all equal, none heavy
    val got = sketch(tokens, 9)
    // nothing can exceed the n/(k+1) confidence threshold
    assert(got.values.forall(_ <= 100L))
  }
}
