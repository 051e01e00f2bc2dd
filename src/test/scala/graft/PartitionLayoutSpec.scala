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
}
