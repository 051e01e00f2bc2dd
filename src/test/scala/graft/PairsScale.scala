package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Composed minhashPairs scaling probe (dev tool):
  * `Test/runMain graft.PairsScale n1 n2 ...` — times the full LSH
  * candidate-pair pipeline (the trailing distinct forces complete
  * evaluation; bare stage count()s are useless here — column pruning
  * deletes the signature computation from a count-only plan).
  */
object PairsScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100000, 200000, 400000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[pairs-scale] heap=${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB")

    def words(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 55).map(i =>
        concat(lit("w"), pmod(hash(id, lit(i)), lit(5000)).cast("string"))): _*)

    for (n <- sizes) {
      val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
        when(col("id") % 10 === 0 && col("id") > 0, words(col("id") - 1))
          .otherwise(words(col("id"))).as("text"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val pairs = graft.ext.Dedup.minhashPairs(docs).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pairs-scale] n=$n%-8d pairs=$pairs%-8d ${sec}%8.2f s  ${(n / sec).toLong}%8d docs/s")
      docs.unpersist()
    }
    spark.stop()
  }
}
