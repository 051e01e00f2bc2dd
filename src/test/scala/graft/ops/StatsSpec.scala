package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("histogram bins by floor(v/width) and counts exactly") {
    val df = Seq(0.0, 49.9, 50.0, 99.9, 100.0, 250.0).toDF("v")
    val h = Stats.histogram(df, col("v"), 50L)
      .orderBy("bin").collect()
    assert(h.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 0L), (1L, 2L, 50L), (2L, 1L, 100L), (5L, 1L, 250L)))
  }

  test("negative values floor toward -inf (SQL floor, not truncate)") {
    val h = Stats.histogram(Seq(-0.5, -50.0).toDF("v"), col("v"), 50L)
      .orderBy("bin").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(-1L))
    assert(h.head.getLong(1) === 2L)
  }

  test("corrComponents matches Spark's corr() to 1e-6 and is partition-invariant") {
    val df = Seq.tabulate(100)(i => ("g", i.toDouble, (3 * i + 7).toDouble + (i % 5)))
      .toDF("g", "x", "y")
    val expected = df.agg(corr(col("x"), col("y"))).head.getDouble(0)
    val got = Stats.corrComponents(df, col("g"), col("x"), col("y"))
      .head.getAs[Double]("corr6")
    assert(math.abs(got - expected) < 1e-6)
    val got1 = Stats.corrComponents(df.repartition(7), col("g"), col("x"), col("y"))
      .head.getAs[Double]("corr6")
    assert(got === got1) // decimal sums make the result layout-independent
  }

  test("perfect linear relation gives corr6 = 1") {
    val df = Seq.tabulate(50)(i => ("g", i.toDouble, (2 * i + 1).toDouble)).toDF("g", "x", "y")
    val got = Stats.corrComponents(df, col("g"), col("x"), col("y"))
      .head.getAs[Double]("corr6")
    assert(got === 1.0)
  }

  test("madOutliers: robust to the outlier itself; lower-median selection; k scales the fence") {
    // group a: 1..9 plus a wild 1000 -> med of 10 values = 5 (lower
    // median, rank ceil(10/2)=5), devs sorted = {0,1,1,2,2,3,3,4,4,995}
    // -> mad = dev at rank 5 = 2; fence 3*2=6: only 1000 is outside.
    val df = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 1000.0))
      .toDF("event_type", "value")
    val r = Stats.madOutliers(df, col("event_type"), col("value")).collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("med") == 5.0)
    assert(r.getAs[Double]("mad") == 2.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }
}
