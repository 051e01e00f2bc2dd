package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: candidate-pair volumes through the PPJoin filter chain of
  * `jaccardPairsPrefixFromSets` (raw in-bucket pairs → after the length
  * filter → after the positional filter → distinct pairs) at the bench
  * SF — the measurement behind the r20 positional-filter change.
  * `Test/runMain graft.PosFilterProbe [t10]`
  */
object PosFilterProbe {
  def main(args: Array[String]): Unit = {
    val t = args.headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Tables.documents(spark, dir)
    // mirror jaccardPairsPrefixFromSets' candidate stage
    val sets = docs
      .select(col("doc_id").as("id"),
        array_sort(array_distinct(transform(
          graft.ext.TextOps.shingleSet(col("text"), 3),
          s => graft.functions.Hashing.md5Hash32(0, s)))).as("hs"))
      .withColumn("n", size(col("hs")))
      .filter(col("n") > 0)
    val sh = sets.select(col("id"), col("n"), explode(col("hs")).as("h"))
    val df = sh.groupBy("h").agg(count(lit(1)).as("d"))
    val ranked = sh.join(df, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d"), col("h"))))
    val prefix = ranked
      .filter(col("rk") <= col("n") - expr(s"($t * n + 9) DIV 10") + lit(1))
      .select(col("id"), col("n"), col("h"), col("rk"))
    val raw = prefix.groupBy("h")
      .agg(sort_array(collect_list(struct(col("id"), col("n"), col("rk"))))
        .as("ids"))
      .filter(size(col("ids")) > 1)
      .select(posexplode(col("ids")).as(Seq("i", "pa")), col("ids"))
      .select(col("pa.id").as("id_a"), col("pa.n").as("na"),
        col("pa.rk").as("rka"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("pb"))
      .select(col("id_a"), col("na"), col("rka"),
        col("pb.id").as("id_b"), col("pb.n").as("nb"), col("pb.rk").as("rkb"))
      .localCheckpoint()
    val nRaw = raw.count()
    val afterLen = raw
      .filter(lit(10L) * least(col("na"), col("nb")) >=
        lit(t.toLong) * greatest(col("na"), col("nb")))
      .localCheckpoint()
    val nLen = afterLen.count()
    val afterPos = afterLen
      .filter((least(col("rka"), col("rkb")) +
          least(col("na") - col("rka"), col("nb") - col("rkb"))) *
          lit(10L + t) >=
        lit(t.toLong) * (col("na") + col("nb")))
      .localCheckpoint()
    val nPos = afterPos.count()
    val dRaw = raw.select("id_a", "id_b").distinct().count()
    val dLen = afterLen.select("id_a", "id_b").distinct().count()
    val dPos = afterPos.select("id_a", "id_b").distinct().count()
    println(s"[posfilter] t10=$t raw_occurrences=$nRaw after_length=$nLen" +
      s" after_position=$nPos")
    println(s"[posfilter] distinct_pairs raw=$dRaw after_length=$dLen" +
      s" after_position=$dPos")
    spark.stop()
  }
}
