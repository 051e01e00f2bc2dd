package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: measure ANN recall@10 vs brute force at the q40/q41
  * parameters over the fixture embeddings, at several query-set sizes —
  * input for picking the regression floors in SimSearchSpec.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      for (nq <- Seq(5, 20, 50)) {
        val queries = emb.filter(col("vec_id") < nq)
        def top10(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
          df.select("qid", "vid").as[(Long, Long)].collect()
            .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
        val truth = top10(SimSearch.topKBruteForce(emb, queries, k = 10))
        def recall(got: Map[Long, Set[Long]]): Double =
          truth.map { case (q, t) =>
            got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
          }.sum / truth.size
        val lsh = recall(top10(SimSearch.topKLsh(emb, queries, k = 10, dim = 64,
          numPlanes = 6, probeBits = 6)))
        val ivf = recall(top10(SimSearch.topKIvfPivots(emb, queries, k = 10,
          nlist = 32, nprobe = 8)))
        println(f"[recall] $sf nq=$nq%-3d lsh=$lsh%.3f ivf=$ivf%.3f")
      }
    }
    spark.stop()
  }
}
