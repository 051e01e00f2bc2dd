package graft

import org.apache.spark.sql.SparkSession

/** The 9th hostile variant (the r17 verdict item): the FULL registry
  * executed under a HARD-CAPPED heap — in local mode the driver heap IS
  * the whole JVM, so every bounded-collect claim (the union-find edge
  * ledger, BPE `maxTrainWords` vocab, Markov channel matrix,
  * `QualityModel.maxRows` training slice, `cumHist` partition offsets)
  * actually EXECUTES under memory pressure instead of being
  * require-guarded prose. A row-scaled collect that the scaladoc merely
  * promises is bounded would OOM here.
  *
  * Run as `SPARK_DRIVER_MEM=1g sbt 'Test/runMain graft.DriverHeapSweep'`
  * (`Test/fork` wires SPARK_DRIVER_MEM into -Xmx); the main REFUSES to
  * start on a roomy heap, so the artifact cannot silently record an
  * unpressured pass. Writes `target/hostile_lowheap.json`, which
  * `HostileSweep` merges into HOSTILE_r{N}.json as the `lowheap`
  * variant.
  */
object DriverHeapSweep {

  /** 1 GiB nominal + JVM rounding slack — anything above this is not
    * "memory pressure" and the run aborts.
    */
  val MaxHeapBytes: Long = 1200L * 1024 * 1024

  val QueryTimeout = scala.concurrent.duration.Duration(300, "seconds")

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("target/hostile_lowheap.json")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val heap = Runtime.getRuntime.maxMemory
    require(heap <= MaxHeapBytes,
      s"DriverHeapSweep needs a capped heap: got ${heap / 1048576} MiB; " +
        "launch with SPARK_DRIVER_MEM=1g")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global

    case class Res(query: String, ok: Boolean, rows: Long, ms: Long,
      err: String)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val group = s"lowheap-$name"
        val t0 = System.nanoTime()
        def ms = (System.nanoTime() - t0) / 1000000
        try {
          val fut = scala.concurrent.Future {
            spark.sparkContext.setJobGroup(group, group,
              interruptOnCancel = true)
            try fn(spark, dir).count()
            finally spark.sparkContext.clearJobGroup()
          }
          val rows = scala.concurrent.Await.result(fut, QueryTimeout)
          Res(name, ok = true, rows, ms, "")
        } catch {
          case _: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelJobGroup(group)
            println(s"[lowheap] TIMEOUT $name after ${QueryTimeout}")
            Res(name, ok = false, -1, ms, s"timeout after ${QueryTimeout}")
          case t: Throwable =>
            Res(name, ok = false, -1, ms, t.getClass.getSimpleName + ": " +
              Option(t.getMessage).getOrElse("")
                .replaceAll("[\\s\"]+", " ").take(160))
        }
    }
    spark.stop()

    val failures = results.filterNot(_.ok)
    failures.foreach(r => println(s"[lowheap] FAIL ${r.query}: ${r.err}"))
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val failJson = failures.map(r =>
      s"""{"variant":"lowheap","query":"${r.query}","err":"${esc(r.err)}"}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"variant":"lowheap","heap_max_bytes":$heap,"data_dir":"$dir",
         |"n":${results.size},"failed":${failures.size},
         |"total_ms":${results.map(_.ms).sum},
         |"failures":$failJson}""".stripMargin
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outPath).toAbsolutePath.getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[lowheap] ${results.size} queries, ${failures.size} failed, " +
      s"heap ${heap / 1048576} MiB -> $outPath")
    if (failures.nonEmpty) sys.exit(1)
  }
}
