package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class Row3(key: Long, id: Long, score: Double)

class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("typed top-k aggregator matches the window row_number formulation") {
    val data = (for {
      key <- 0L until 10L
      i <- 0L until 20L
    } yield Row3(key, key * 100 + i, ((key * 7 + i * 13) % 17).toDouble)).toList

    val viaAgg = data.toDS()
      .groupByKey(_.key)
      .mapValues(r => Scored(r.id, r.score))
      .agg(TopKAggregator(3).toColumn.name("topk"))
      .flatMap { case (key, top) => top.map(s => (key, s.id, s.score)) }
      .collect().toSet

    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val viaWindow = data.toDF()
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"key", $"id", $"score")
      .as[(Long, Long, Double)].collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("buffer stays bounded at k (merge of oversized sides)") {
    val agg = TopKAggregator(2)
    val b = (1 to 10).foldLeft(agg.zero)((acc, i) => agg.reduce(acc, Scored(i.toLong, i.toDouble)))
    assert(b.size == 2 && b.map(_.id) == Seq(10L, 9L))
    val merged = agg.merge(b, Seq(Scored(99L, 100.0)))
    assert(merged.size == 2 && merged.head.id == 99L)
  }
}
