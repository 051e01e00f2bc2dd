package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named registry queries to files:
  * `Test/runMain graft.PlanDump <outDir> <suffix> qA qB ...` writes
  * `<outDir>/<name>_<suffix>.txt` per query — the plans/rNN evidence
  * convention (suffix `before`/`after`). Data dir via
  * SPARK_GRAFT_SF_DIR (default sf0.1 — plan shape, not timing, so any
  * SF with the full schema works; sf0.1 matches the bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)
    // parallelism from the bench's env contract (default 32 — the value
    // every committed plans/rNN artifact was dumped at), so plan
    // evidence reproduces on any box: SPARK_GRAFT_CPUS=8 PlanDump ...
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
