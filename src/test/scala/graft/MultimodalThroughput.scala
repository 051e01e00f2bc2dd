package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the REAL multimodal decode paths (dev tool):
  * `Test/runMain graft.MultimodalThroughput [nRows]` — synthetic PNG /
  * MJPEG-in-MP4 payloads (built once per row on executors, then
  * checkpointed so the timed pass measures DECODE, not fixture
  * construction) through `decodeImageMeta`, `resizeMeta`,
  * `decodeVideoMeta`, `keyframeRanges` and `decodeKeyframeFrames`,
  * printing payloads/sec. Numbers feed SCALE.md's throughput tables.
  */
object MultimodalThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.find(a => a.nonEmpty && a.forall(_.isDigit)).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pngs = spark.range(n.toLong).as[Long]
      .map(id => (id, graft.ext.Png.syntheticGradient(id)))
      .toDF("doc_id", "payload").localCheckpoint(true)
    val mjpegs = spark.range(n.toLong).as[Long]
      .map(id => (id, graft.ext.Bmff.syntheticMjpeg(id)))
      .toDF("doc_id", "payload").localCheckpoint(true)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[mm-tput] $label%-26s ${sec}%7.2f s  ${(n / sec).toLong}%8d payloads/s")
    }

    time("warmup scan")(pngs.count() + mjpegs.count())
    time("decodeImageMeta(png)")(pngs
      .select(graft.ext.Multimodal.decodeImageMeta(col("payload")).as("m"))
      .agg(sum(col("m.mean_pixel_ppm"))).collect())
    time("resizeMeta(png,224)")(pngs
      .select(graft.ext.Multimodal.resizeMeta(col("payload")).as("m"))
      .agg(sum(col("m.mean_pixel_ppm"))).collect())
    time("decodeVideoMeta(mp4)")(mjpegs
      .select(graft.ext.Multimodal.decodeVideoMeta(col("payload")).as("m"))
      .agg(sum(col("m.duration_ms"))).collect())
    time("keyframeRanges(mp4)")(mjpegs
      .select(size(graft.ext.Multimodal.keyframeRanges(col("payload"))).as("k"))
      .agg(sum(col("k"))).collect())
    // 2-3 real JPEG frame decodes per payload
    time("decodeKeyframeFrames")(mjpegs
      .select(explode(graft.ext.Multimodal.decodeKeyframeFrames(col("payload"))).as("kf"))
      .agg(sum(col("kf.frame.mean_pixel_ppm"))).collect())
    spark.stop()
  }
}
