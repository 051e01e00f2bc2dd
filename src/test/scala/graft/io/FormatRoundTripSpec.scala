package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

/** File-format coverage beyond the reference's JSON (SURVEY §2.3 "File
  * formats" row): CSV and JSON-lines round trips preserve values and
  * schema under an explicit read schema — the engine can land and re-read
  * its outputs in every text format Spark ships, not just the parquet
  * fixtures.
  */
class FormatRoundTripSpec extends SparkTestBase {

  private def sample = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("lang"), col("n_chars"))
    .orderBy("doc_id")

  test("CSV round trip: header + explicit schema preserves rows and types") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema("doc_id LONG, lang STRING, n_chars LONG")
      .csv(dir)
      .orderBy("doc_id")
    assert(back.schema == sample.schema)
    assert(back.collect().toList == sample.collect().toList)
  }

  test("JSON-lines round trip preserves rows and types") {
    val dir = Files.createTempDirectory("graft_jsonl_").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("doc_id LONG, lang STRING, n_chars LONG")
      .json(dir)
      .orderBy("doc_id")
    assert(back.collect().toList == sample.collect().toList)
  }
}
