package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical-layout proofs for the 100 TB design claims (SCALE.md):
  * partition pruning on Hive-style layouts, and bucketed co-located joins
  * that eliminate the shuffle.
  */
class PartitionLayoutSpec extends SparkTestBase {

  test("Hive-partitioned layout prunes partitions at scan time") {
    val dir = Files.createTempDirectory("graft_prune_").toString
    graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val filtered = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString

    // the filter must reach the scan as a PartitionFilter (metadata-only
    // pruning), not a post-scan Filter
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("event_type"),
      s"partition filter on event_type expected, scan was: $scanLine")
    assert(!plan.contains("Filter (event_type"),
      "predicate should be partition-pruned, not row-filtered")
    val expected = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "click").count()
    assert(filtered.count() == expected)
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val s = spark.newSession() // default warehouse (spark-warehouse/, gitignored)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    Seq("orders_b", "customer_b").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    graft.core.Tables.orders(s, "/root/testdata/sf0.001")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    graft.core.Tables.customer(s, "/root/testdata/sf0.001")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val joined = s.table("orders_b")
      .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(900)}")
    assert(joined.count() > 0)
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    // The 100 TB scan-reduction story for star joins: the fact table is
    // partitioned on the join key's coarse bucket; filtering the DIM
    // side must prune fact PARTITIONS at runtime (Catalyst's DPP
    // subquery), not scan-all-then-join. 10 partitions, dim filter
    // keeps one key -> the fact scan must read ~1/10th of the rows.
    val dir = Files.createTempDirectory("graft_dpp_").toString
    graft.core.Tables.orders(spark, "/root/testdata/sf0.01")
      .withColumn("o_bucket", pmod(col("o_custkey"), lit(10L)))
      .write.mode("overwrite").partitionBy("o_bucket").parquet(dir)

    val fact = spark.read.parquet(dir)
    val dim = graft.core.Tables.customer(spark, "/root/testdata/sf0.01")
      .filter(col("c_custkey") === 7L) // one bucket survives
      .withColumn("c_bucket", pmod(col("c_custkey"), lit(10L)))

    val totalOrders = graft.core.Tables.orders(spark, "/root/testdata/sf0.01").count()
    val expected = graft.core.Tables.orders(spark, "/root/testdata/sf0.01")
      .filter(pmod(col("o_custkey"), lit(10L)) === 7L).count()

    // runtime proof, not just plan text: total records read by the join
    // job must stay well under the full fact table (the unpruned scan
    // would read all `totalOrders` rows before joining)
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val joined = fact.join(dim, col("o_bucket") === col("c_bucket"))
    try {
      assert(joined.count() == expected)
      // listener delivery is async; poll until the read counter covers
      // at least the pruned partition
      val deadline = System.nanoTime() + 10e9.toLong
      while (recordsRead.get() < expected && System.nanoTime() < deadline)
        Thread.sleep(100)
    } finally spark.sparkContext.removeSparkListener(listener)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a DPP filter on the fact scan:\n${plan.take(1200)}")
    val read = recordsRead.get()
    assert(read >= expected, s"listener saw too few records: $read")
    assert(read < totalOrders,
      s"DPP should read ~1/10th of the fact table, read $read of $totalOrders")
  }
}
