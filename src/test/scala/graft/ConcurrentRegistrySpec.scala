package graft

import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-registry smoke (the round-16 verdict item): the driver
  * runs queries sequentially, so the per-session seams — the
  * `core.Tables` plan cache (ConcurrentHashMap + idempotent conf sets),
  * `localCheckpoint` lineage cuts, the driver-solve collects — had
  * never been exercised under concurrency. This spec runs the FULL
  * registry on ONE session from a fixed-size thread pool and asserts
  * every query's result is hash-identical to its sequential run: a
  * cache race, a conf toggle, or any shared mutable state in an
  * operator would show as a diverging hash or an exception.
  *
  * sf0.001 keeps the double pass cheap; thread-safety is a property of
  * the code paths, not the data volume.
  */
class ConcurrentRegistrySpec extends AnyFunSuite {

  test("all registry queries are thread-safe on one shared session") {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"

    def hash(name: String): String = {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map(_.toString).sorted.foreach(s =>
        md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      s"${rows.length}:${md.digest().map("%02x".format(_)).mkString}"
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val sequential = names.map(n => n -> hash(n)).toMap

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = names.map(n =>
      scala.concurrent.Future(n -> scala.util.Try(hash(n))))
    val concurrent =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(1800, "seconds")).toMap
      finally pool.shutdown()

    val diverging = names.flatMap { n =>
      concurrent(n) match {
        case scala.util.Success(h) if h == sequential(n) => None
        case scala.util.Success(h) =>
          Some(s"$n: sequential ${sequential(n)} != concurrent $h")
        case scala.util.Failure(t) =>
          Some(s"$n: failed concurrently with ${t.getClass.getSimpleName}: " +
            Option(t.getMessage).getOrElse("").take(120))
      }
    }
    assert(diverging.isEmpty,
      s"concurrent runs diverge from sequential:\n${diverging.mkString("\n")}")
  }
}
