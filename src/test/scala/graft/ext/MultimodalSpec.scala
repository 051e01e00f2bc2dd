package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello world media payload")).toDF("doc_id", "text")

  test("withPayload produces a binary column of the UTF-8 bytes") {
    val r = Multimodal.withPayload(docs).select("payload").collect().head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world media payload")
  }

  test("mediaTable: byte length, deterministic stub metadata, feature vector shape") {
    val m = Multimodal.mediaTable(docs)
    val r = m.collect().head
    assert(r.getAs[Long]("n_bytes") == 25L)
    val media = r.getStruct(r.fieldIndex("media"))
    assert(media.getAs[Long]("width") >= 1 && media.getAs[Long]("width") <= 1280)
    assert(media.getAs[Long]("height") >= 1 && media.getAs[Long]("height") <= 720)
    assert(r.getAs[collection.Seq[Double]]("feature").size == 4)
    assert(r.getAs[collection.Seq[Double]]("feature").forall(f => f >= 0.0 && f < 1.0))
    // deterministic: same input -> same stub output
    assert(Multimodal.mediaTable(docs).collect().head == r)
  }

  test("decodeBatched (mapPartitions seam) agrees with the expression-based stub") {
    val many = (0L until 50L).map(i => (i, s"payload number $i with content")).toDF("doc_id", "text")
    val viaExpr = Multimodal.mediaTable(many)
      .select(col("doc_id"), col("n_bytes"),
        col("media.width").as("width"), col("media.height").as("height"),
        col("media.duration_ms").as("duration_ms"))
      .as[DecodedMedia].collect().sortBy(_.doc_id)
    val viaBatch = Multimodal.decodeBatched(many)
      .as[DecodedMedia].collect().sortBy(_.doc_id)
    assert(viaBatch.toList == viaExpr.toList)
  }

  test("sampleSlices returns n byte-slices of the payload") {
    val s = Multimodal.withPayload(docs)
      .select(Multimodal.sampleSlices(col("payload"), 3, 4).as("slices"))
      .collect().head.getAs[collection.Seq[Array[Byte]]]("slices")
    assert(s.size == 3)
    assert(new String(s.head, "UTF-8") == "hell")
  }

  test("resizeStub fits dimensions into the target box, preserving aspect") {
    def resize(w: Long, h: Long): (Long, Long) = {
      val r = Seq((w, h)).toDF("w", "h")
        .select(Multimodal.resizeStub(
          struct(col("w").as("width"), col("h").as("height"))).as("r"))
        .select(col("r.rw"), col("r.rh")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    assert(resize(1280L, 720L) == (224L, 126L)) // floor(720*224/1280)
    assert(resize(720L, 1280L) == (126L, 224L)) // portrait mirrors
    assert(resize(100L, 100L) == (224L, 224L))  // upscales to the box
  }
}
