package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench report line's STRUCTURAL byte-budget guarantee — the
  * driver keeps only the last ~2000 chars of stdout and a clipped head
  * kills the whole JSON (it zeroed round 11's perf adjudication), so the
  * fit property must hold at any query-surface size, not be re-audited
  * every round as the surface grows.
  */
class BenchReportSpec extends AnyFunSuite {

  private def results(n: Int, failEvery: Int = 0): Seq[Bench.QueryResult] =
    (1 to n).map { i =>
      val sec = (i % 23) * 0.1 + i * 0.001
      Bench.QueryResult(f"q$i%03d_some_operator", sec,
        if (failEvery > 0 && i % failEvery == 0) Some("RuntimeException") else None,
        sec * 1.2)
    }

  private def parse(line: String): Map[String, Any] = {
    // minimal structural check without a JSON lib: balanced braces, no
    // trailing commas, and the fields we rely on present
    assert(line.count(_ == '{') == line.count(_ == '}'), s"unbalanced braces: $line")
    assert(!line.contains("{,") && !line.contains(",}") && !line.contains(",,"),
      s"malformed commas: $line")
    Map("raw" -> line)
  }

  test("160 queries fit the 1900-byte budget with a parseable line") {
    val line = Bench.reportLine(results(160), "sf0.1", 1.0, 1.2, 32)
    assert(line.length <= 1900, s"line is ${line.length}B")
    parse(line)
    assert(line.contains("\"n_queries\":160"))
    assert(line.contains("\"queries\":{"))
  }

  test("1000 queries still fit: slow prefix kept, overflow summarized") {
    val line = Bench.reportLine(results(1000), "sf0.1", 1.0, 1.2, 32)
    assert(line.length <= 1900, s"line is ${line.length}B")
    parse(line)
    assert(line.contains("\"q_dropped\":"), "overflow must be summarized")
    assert(line.contains("\"q_dropped_ms\":"))
    // the kept entries are the SLOWEST ones: the max query time must appear
    val maxMs = results(1000).map(r => math.round(r.minSec * 1000)).max
    assert(line.contains(s":$maxMs"), "slowest query must survive the cut")
  }

  test("per-query ms reconcile: kept entries + q_dropped_ms = all queries") {
    val rs = results(400)
    val line = Bench.reportLine(rs, "sf0.1", 1.0, 1.2, 32)
    val qmap = line.substring(line.indexOf("\"queries\":{") + "\"queries\":".length)
    val keptSum = "\"q\\d+\":(\\d+)".r.findAllMatchIn(qmap).map(_.group(1).toLong).sum
    val droppedSum = "\"q_dropped_ms\":(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toLong).getOrElse(0L)
    val allSum = rs.map(r => math.round(r.minSec * 1000)).sum
    assert(keptSum + droppedSum == allSum)
  }

  test("small surfaces keep every query with no drop marker") {
    val line = Bench.reportLine(results(50), "sf0.01", 0.5, 0.6, 4)
    assert(line.length <= 1900)
    assert(!line.contains("q_dropped"))
    assert("\"q\\d+\":".r.findAllMatchIn(line).size == 50)
  }

  test("failed queries ride in the failed map and never count in value") {
    val line = Bench.reportLine(results(30, failEvery = 10), "sf0.01", 0.5, 0.6, 4)
    assert(line.contains("\"n_failed\":3"))
    assert(line.contains("\"failed\":{"))
    assert(line.contains("RuntimeException"))
    parse(line)
  }

  test("empty result set emits a valid headline") {
    val line = Bench.reportLine(Nil, "sf0.001", 0.1, 0.1, 4)
    assert(line.contains("\"n_queries\":0"))
    parse(line)
  }

  test("duplicate qNN short prefixes are rejected loudly") {
    val dup = Seq(Bench.QueryResult("q01_a", 0.1, None, 0.1),
      Bench.QueryResult("q01_b", 0.2, None, 0.2))
    assertThrows[IllegalArgumentException](
      Bench.reportLine(dup, "sf0.001", 0.1, 0.1, 4))
  }

  test("fullReportJson carries EVERY query with full names, min+max ms, errors") {
    val rs = results(400, failEvery = 100)
    val json = Bench.fullReportJson(rs, "sf0.1", 1.0, 1.2, 32)
    parse(json)
    // no budget: all 400 full names present (the stdout line sheds; the
    // file artifact must not)
    rs.foreach(r => assert(json.contains(s""""${r.name}":"""), r.name))
    assert("\"min_ms\":".r.findAllMatchIn(json).size == 400)
    assert("\"max_ms\":".r.findAllMatchIn(json).size == 400)
    assert("\"err\":\"RuntimeException\"".r.findAllMatchIn(json).size == 4)
    assert(json.contains("\"n_queries\":400") && json.contains("\"n_failed\":4"))
    // slowest-first ordering: the max min_ms is the first entry
    val firstMs = "\"min_ms\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toLong).get
    val maxMs = rs.map(r => math.round(r.minSec * 1000)).max
    assert(firstMs == maxMs, s"first entry $firstMs must be the slowest $maxMs")
  }
}
