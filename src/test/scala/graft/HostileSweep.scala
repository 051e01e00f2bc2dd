package graft

import org.apache.spark.sql.SparkSession

/** Hostile-fixture system gate (the round-16 verdict item): run the FULL
  * query registry against each adversarial variant of sf0.01 produced by
  * `tools/make_hostile.py` (empty, single-row, 50%-hot-key skew, a 10 MB
  * document, all-identical embeddings, all-NULL event_time, saturated
  * shingle vocabulary, an 80%-dominant language/source stratum, and
  * calendar-edge timestamps straddling a year boundary / leap day /
  * both US DST transitions) and assert the system property the per-op specs
  * cannot: EVERY query completes without OOM/exception and returns its
  * sf0.01 result SCHEMA unchanged (possibly with zero rows). Since r18
  * the artifact also merges one extra variant — `graft.DriverHeapSweep`'s
  * full-registry run under a 1 GiB JVM (`lowheap`), which must be run
  * first in its own capped process (10 variants total since r19's
  * skewlang).
  *
  * `Test/runMain graft.HostileSweep [hostileRoot] [outPath]` — writes
  * HOSTILE_r{N}.json and exits 1 on any failure or schema drift.
  */
object HostileSweep {

  val Variants = Seq("empty", "single", "skew", "bigdoc", "flatvec",
    "nullts", "satvocab", "skewlang", "dst")

  /** Per-query wall-clock bound: a hostile input that WEDGES a query
    * (the very first sweep caught chunkTokens re-splitting a 10 MB doc
    * per window) is a failure the gate must report, not hang on.
    */
  val QueryTimeout = scala.concurrent.duration.Duration(180, "seconds")

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("target/hostile")
    val outPath = args.drop(1).headOption.getOrElse("HOSTILE_r19.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global

    // reference schemas from the REAL sf0.01 build (analysis only — no
    // execution): hostile results must match these exactly
    val refSchemas: Map[String, String] = SparkEntry.queries.map {
      case (name, fn) =>
        name -> fn(spark, "/root/testdata/sf0.01").schema.map(f =>
          s"${f.name}:${f.dataType.sql}").mkString(",")
    }

    case class Res(variant: String, query: String, ok: Boolean, rows: Long,
      ms: Long, err: String)
    val results = for {
      v <- Variants
      _ = { println(s"[hostile] sweeping variant $v ..."); Console.flush() }
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
    } yield {
      val dir = s"$root/$v"
      val group = s"hostile-$v-$name"
      val t0 = System.nanoTime()
      def ms = (System.nanoTime() - t0) / 1000000
      try {
        val fut = scala.concurrent.Future {
          spark.sparkContext.setJobGroup(group, group, interruptOnCancel = true)
          try {
            val df = fn(spark, dir)
            val got = df.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")
            (got, df.count())
          } finally spark.sparkContext.clearJobGroup()
        }
        val (got, rows) = scala.concurrent.Await.result(fut, QueryTimeout)
        if (got != refSchemas(name))
          Res(v, name, ok = false, rows, ms, s"schema drift: $got")
        else Res(v, name, ok = true, rows, ms, "")
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          println(s"[hostile] TIMEOUT $v/$name after ${QueryTimeout}")
          Res(v, name, ok = false, -1, ms, s"timeout after ${QueryTimeout}")
        case t: Throwable =>
          val msg = (t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("").replaceAll("[\\s\"]+", " ").take(160))
          Res(v, name, ok = false, -1, ms, msg)
      }
    }
    spark.stop()

    // the lowheap variant runs in its OWN JVM (a heap cap is set at
    // launch, not mid-process): graft.DriverHeapSweep under
    // SPARK_DRIVER_MEM=1g writes this fragment, and the sweep REQUIRES
    // it so the artifact always records every variant
    val lowheapPath = "target/hostile_lowheap.json"
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(lowheapPath)),
      s"missing $lowheapPath - run SPARK_DRIVER_MEM=1g " +
        "sbt 'Test/runMain graft.DriverHeapSweep' first")
    // parse the fragment with a REAL JSON parser (jackson rides Spark's
    // classpath) — the previous regex-scrape + raw substring splice
    // would silently corrupt the artifact if DriverHeapSweep ever added
    // a field after the failures array or an earlier string field
    // contained the literal `"n":`
    val lowheapTree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lowheapPath)))
    def lhField(k: String): Long = {
      val node = lowheapTree.get(k)
      require(node != null && node.canConvertToLong,
        s"$lowheapPath missing numeric field $k")
      node.asLong()
    }
    val (lhN, lhFailed, lhMs) = (lhField("n"), lhField("failed"),
      lhField("total_ms"))
    require(lhN == SparkEntry.queries.size,
      s"$lowheapPath covers $lhN queries, registry has " +
        s"${SparkEntry.queries.size} - rerun DriverHeapSweep")
    val lhFailuresNode = lowheapTree.get("failures")
    require(lhFailuresNode != null && lhFailuresNode.isArray,
      s"$lowheapPath missing failures array")
    val lhFailures = (0 until lhFailuresNode.size())
      .map(i => lhFailuresNode.get(i).toString).mkString(",")

    val failures = results.filterNot(_.ok)
    failures.foreach(r =>
      println(s"[hostile] FAIL ${r.variant}/${r.query}: ${r.err}"))
    val byVariant = Variants.map { v =>
      val rs = results.filter(_.variant == v)
      val fails = rs.count(!_.ok)
      val ms = rs.map(_.ms).sum
      println(f"[hostile] $v%-9s ${rs.size}%4d queries, $fails%3d failed, ${ms / 1000.0}%7.1f s")
      s""""$v":{"n":${rs.size},"failed":$fails,"total_ms":$ms}"""
    } :+ {
      println(f"[hostile] lowheap  $lhN%4d queries, $lhFailed%3d failed, ${lhMs / 1000.0}%7.1f s (merged from $lowheapPath)")
      s""""lowheap":{"n":$lhN,"failed":$lhFailed,"total_ms":$lhMs}"""
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val failJson = (failures.map(r =>
      s"""{"variant":"${r.variant}","query":"${r.query}","err":"${esc(r.err)}"}""") ++
      Option.when(lhFailures.trim.nonEmpty)(lhFailures))
      .mkString("[", ",", "]")
    val totalFailures = failures.size + lhFailed
    val json =
      s"""{"round":19,"variants":{${byVariant.mkString(",")}},
         |"contract":"every registered query completes on every hostile variant (9 data variants + the 1 GiB lowheap JVM) and preserves its sf0.01 output schema",
         |"n_queries":${SparkEntry.queries.size},"n_failures":$totalFailures,
         |"failures":$failJson}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[hostile] total failures: $totalFailures -> $outPath")
    if (totalFailures > 0) sys.exit(1)
  }
}
