package graft.ext

import org.apache.spark.sql.functions._

/** Scratch timing harness for the MinHash pipeline stages (not a test). */
object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sig = Dedup.minhashSignatureArray(docs)
    time("sig forced")(sig.agg(sum(element_at(col("sig"), 1))).collect())

    val bands = sig
      .select(col("id"), explode(sequence(lit(0), lit(3))).as("band"), col("sig"))
      .withColumn("bkey", concat_ws(",",
        transform(sequence(lit(0), lit(3)),
          r => element_at(col("sig"), col("band") * 4 + r + 1).cast("string"))))
      .drop("sig")
    time("bands forced")(bands.agg(sum(length(col("bkey")))).collect())

    val a = bands.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("bkey"), col("id").as("id_b"))
    val joined = a.join(b, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
    time("join forced")(joined.count())
    time("distinct pairs")(joined.select("id_a", "id_b").distinct().count())
    joined.select("id_a", "id_b").distinct().explain("formatted")
    spark.stop()
  }
}
