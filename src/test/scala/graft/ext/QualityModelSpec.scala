package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  // clearly separable classes: varied prose vs degenerate repetition/noise
  private def goodDoc(i: Int): String =
    s"article $i the quick brown fox jumps over a lazy dog while other " +
      s"animals watch from tall green trees near a quiet river bank and " +
      s"the evening sun sets slowly behind distant hills item$i"
  private def junkDoc(i: Int): String =
    if (i % 2 == 0) ("spam " * 30).trim
    else s"$i 77 !!! %%% 0x$i ### $i$i$i 99 @@@ ^^^"

  private def labeled = ((0 until 40).map(i => (goodDoc(i), 1)) ++
    (0 until 40).map(i => (junkDoc(i), 0))).toDF("text", "label")

  test("train separates held-out good prose from junk") {
    val w = QualityModel.train(labeled)
    val holdout = ((100 until 120).map(i => (goodDoc(i), 1)) ++
      (100 until 120).map(i => (junkDoc(i), 0))).toDF("text", "label")
    val scored = holdout
      .select(col("label"), QualityModel.score(col("text"), w).as("p"))
      .as[(Int, Double)].collect()
    val acc = scored.count { case (y, p) => (p >= 0.5) == (y == 1) }.toDouble / scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc; scores=${scored.take(6).toList}")
    // calibrated direction, not just thresholded: good prose scores higher
    val meanGood = scored.filter(_._1 == 1).map(_._2).sum / 20
    val meanJunk = scored.filter(_._1 == 0).map(_._2).sum / 20
    assert(meanGood > meanJunk + 0.2, s"good=$meanGood junk=$meanJunk")
  }

  test("training is deterministic and partition-invariant") {
    val w1 = QualityModel.train(labeled)
    val w2 = QualityModel.train(labeled.repartition(13))
    assert(w1.toList == w2.toList)
  }

  test("train skips NULL text/label rows instead of NPE-ing mid-collect") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    // honest nullable schema — a non-nullable schema carrying actual
    // nulls makes Catalyst elide the isNotNull guard (GIGO by contract)
    val schema = StructType(Seq(
      StructField("text", StringType, nullable = true),
      StructField("label", IntegerType, nullable = true)))
    val nullRows = spark.createDataFrame(
      List(Row(null, 1), Row("some text", null)).asJava, schema)
    val honest = spark.createDataFrame(
      labeled.collect().toList.asJava, schema)
    val w = QualityModel.train(honest.union(nullRows))
    assert(w.toList == QualityModel.train(labeled).toList,
      "null rows must be dropped, leaving training unchanged")
  }

  test("train refuses an over-sized labeled set instead of collecting it") {
    val e = intercept[IllegalArgumentException] {
      QualityModel.train(labeled, maxRows = 10)
    }
    assert(e.getMessage.contains("sample-scale"))
  }

  test("score is a flat scalar expression: no shuffle, no lambda nodes") {
    val w = QualityModel.train(labeled)
    val plan = labeled.select(QualityModel.score(col("text"), w).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scoring must be shuffle-free")
    assert(!plan.toLowerCase.contains("lambdafunction"), "no interpreted HOFs")
  }
}
