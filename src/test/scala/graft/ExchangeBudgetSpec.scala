package graft

import org.scalatest.funsuite.AnyFunSuite

/** Frozen plan shapes (the round-16 verdict item): every registry
  * query's physical plan must stay within the per-query (shuffle,
  * broadcast) Exchange budget recorded in
  * `tools/expected_exchanges.json` — so a refactor that silently adds a
  * shuffle fails CI the day it lands instead of surfacing as a bench
  * regression rounds later.
  *
  * The check is `≤`, not `=`: a plan that LOSES an exchange passes (and
  * the budget should then be ratcheted down). Regenerate after a
  * reviewed, intentional change with
  * `Test/runMain graft.PlanAudit --write-budget`; a registry query with
  * no budget entry fails loudly for the same reason.
  */
class ExchangeBudgetSpec extends AnyFunSuite {

  private val Entry =
    """"(q[^"]+)":\s*\{"shuffle":\s*(\d+),\s*"broadcast":\s*(\d+)\}""".r

  test("every query plan stays within its frozen exchange budget") {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    // PINNED to the SF the budget was recorded at — NOT the env var:
    // plan shapes (broadcast-vs-shuffle picks) are size-dependent, and
    // an sbt test run under a different SPARK_GRAFT_SF_DIR must not
    // fail against an sf0.01 budget
    val dir = "/root/testdata/sf0.01"
    val raw = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(PlanAudit.BudgetPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val budget: Map[String, (Int, Int)] = Entry.findAllMatchIn(raw)
      .map(m => m.group(1) -> ((m.group(2).toInt, m.group(3).toInt))).toMap
    assert(budget.nonEmpty, s"no budget entries in ${PlanAudit.BudgetPath}")

    val missing = SparkEntry.queries.keySet -- budget.keySet
    assert(missing.isEmpty,
      s"queries with no frozen exchange budget (run " +
        s"'Test/runMain graft.PlanAudit --write-budget' after reviewing " +
        s"their plans): ${missing.toSeq.sorted.mkString(", ")}")

    val over = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val (sh, bc) = PlanAudit.exchangeCounts(
          fn(spark, dir).queryExecution.executedPlan.toString)
        val (shB, bcB) = budget(name)
        val issues =
          (if (sh > shB) Seq(s"shuffle $sh > budget $shB") else Nil) ++
            (if (bc > bcB) Seq(s"broadcast $bc > budget $bcB") else Nil)
        if (issues.isEmpty) Nil else Seq(s"$name: ${issues.mkString("; ")}")
    }
    assert(over.isEmpty,
      s"plans exceed their frozen exchange budget:\n${over.mkString("\n")}")
  }
}
