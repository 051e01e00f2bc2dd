package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal-column plumbing (north-star extensions, SURVEY.md §2.4).
  *
  * Images/audio/video are carried as opaque `binary` columns plus typed
  * metadata. The Spark-side contract — schema, partition-friendly batch
  * shape, expression/`mapPartitions` seams — is real and tested; the actual
  * media decode is STUBBED (`decodeStub`) with a deterministic fake because
  * no media codec libraries ship in this environment. Swap `decodeStub`
  * for a real decoder (e.g. a JNI/codec mapPartitions) without touching
  * the surrounding dataflow.
  */
object Multimodal {

  /** Attach a binary payload column derived from text (test harness for
    * the binary pipeline; in production the payload arrives from the
    * source as real media bytes).
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8").cast("binary"))

  /** Payload size in bytes. */
  def byteLength(payload: Column): Column = octet_length(payload).cast("long")

  /** STUB decoder ========================================================
    * A real implementation decodes the media header; this deterministic
    * fake derives plausible (width, height, duration_ms) metadata from the
    * payload's content hash so every downstream operator (partitioning,
    * filtering, feature joins) is exercised with stable values.
    */
  def decodeStub(payload: Column): Column = {
    val h = Hashing.md5Hash32(0, payload.cast("string"))
    struct(
      (h % 1280 + 1).cast("long").as("width"),
      (floor(h / 1280) % 720 + 1).cast("long").as("height"),
      (h % 60000).cast("long").as("duration_ms"))
  }

  /** Frame-sampling analog: byte-range slices at `n` evenly spaced offsets
    * (for real video this is keyframe extraction; the slicing/batching
    * dataflow is identical).
    */
  def sampleSlices(payload: Column, n: Int, sliceLen: Int = 8): Column = {
    val total = octet_length(payload)
    val step = greatest((total - sliceLen) / lit(math.max(n - 1, 1)), lit(0))
    transform(sequence(lit(0), lit(n - 1)),
      i => payload.substr(i * step + 1, lit(sliceLen)))
  }

  /** Deterministic fixed-width feature vector from the payload (stand-in
    * for an image/audio embedding model; 4 hash-derived doubles in [0,1)).
    */
  def featureStub(payload: Column, dim: Int = 4): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => Hashing.hashUnit(i, payload.cast("string")))

  /** Media metadata table: id, byte length, decoded header fields, feature
    * vector — the canonical multimodal projection.
    */
  def mediaTable(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val withBin = withPayload(df)
    withBin.select(
      col(idCol),
      byteLength(col("payload")).as("n_bytes"),
      decodeStub(col("payload")).as("media"),
      featureStub(col("payload")).as("feature"))
  }
}
