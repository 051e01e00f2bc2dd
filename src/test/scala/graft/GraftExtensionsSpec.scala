package graft

class GraftExtensionsSpec extends SparkTestBase {

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)

    val h = spark.sql("SELECT md5_hash32('0:the cat') AS h").collect().head.getLong(0)
    val reference = spark.sql(
      "SELECT CAST(conv(substring(md5('0:the cat'), 1, 8), 16, 10) AS BIGINT) AS h")
      .collect().head.getLong(0)
    assert(h == reference, "md5_hash32 must equal the portable SQL definition")

    val shingles = spark.sql("SELECT shingle_set('a b c d', 3) AS s")
      .collect().head.getAs[collection.Seq[String]](0)
    assert(shingles.toList == List("a b c", "b c d"))
  }

  test("shingle_set rejects a non-literal size") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_set('a b c', length('xx'))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
