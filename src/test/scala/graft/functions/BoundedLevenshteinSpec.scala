package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[BoundedLevenshteinExpr]] to Spark's reference `levenshtein`:
  * equal distance whenever the true distance is ≤ maxDist, −1 whenever
  * it exceeds it — across random strings, heavy shared prefixes/
  * suffixes (the trim path), multi-byte code points, and bound edges.
  */
class BoundedLevenshteinSpec extends SparkTestBase {

  import BoundedLevenshteinExpr.boundedLevenshtein

  private def check(maxDist: Int, rows: Seq[(String, String)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("a", "b")
      .withColumn("ref", levenshtein(col("a"), col("b")))
      .withColumn("got", boundedLevenshtein(col("a"), col("b"), maxDist))
    val bad = df.filter(
      (col("ref") <= maxDist && col("got") =!= col("ref")) ||
        (col("ref") > maxDist && col("got") =!= lit(-1))).collect()
    assert(bad.isEmpty, s"maxDist=$maxDist mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("matches reference levenshtein on deterministic random pairs") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val rows = Seq.fill(300)((word(rnd.nextInt(20)), word(rnd.nextInt(20))))
    for (d <- Seq(0, 1, 3, 10)) check(d, rows)
  }

  test("trim path: long shared prefix and suffix around a small edit") {
    val pre = "the quick brown fox jumps over the lazy dog " * 20
    val suf = " and then some trailing content repeated" * 20
    val rows = Seq(
      (pre + "alpha" + suf, pre + "alpha" + suf),       // identical -> 0
      (pre + "alpha" + suf, pre + "alphX" + suf),       // 1 substitution
      (pre + "alpha" + suf, pre + "alph" + suf),        // 1 deletion
      (pre + "alpha" + suf, pre + "alpha extra" + suf), // 6 insertions
      (pre + "aaaaaaaaaaaaaaa" + suf, pre + "bbbbbbbbbbbbbbb" + suf)) // 15 > 10
    check(10, rows)
  }

  test("code points: multi-byte chars count as single edits") {
    val rows = Seq(
      ("café", "cafe"),                 // é vs e = 1 substitution
      ("日本語", "日本"), // drop one CJK char = 1
      ("a😀b", "ab"))               // delete an emoji (surrogate pair) = 1
    check(2, rows)
  }

  test("bound edges and degenerate inputs") {
    check(0, Seq(("", ""), ("a", "a"), ("a", "b"), ("same", "same")))
    check(1, Seq(("", "a"), ("a", ""), ("", "ab"), ("abc", "abc")))
    // length-delta short-circuit: |len diff| > maxDist -> -1
    check(3, Seq(("aaaa", "aaaaaaaaaa"), ("", "abcdefgh")))
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq((Some("a"), None: Option[String]), (None, Some("b")))
      .toDF("a", "b")
      .select(boundedLevenshtein(col("a"), col("b"), 5).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }
}
