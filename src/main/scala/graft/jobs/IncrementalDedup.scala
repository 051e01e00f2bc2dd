package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextOps}

/** Batch-over-batch exact dedup against a PERSISTED fingerprint index —
  * the production ingest shape when data arrives as periodic batch drops
  * rather than a stream (the streaming twin is
  * `CorpusCuration.curateAtIngest`'s watermarked
  * `dropDuplicatesWithinWatermark`, whose state is bounded by the
  * watermark horizon; the index here is unbounded history by design).
  *
  * Per batch:
  *  1. in-batch exact dedup (one window shuffle, [[Dedup.exactDedup]]);
  *  2. anti-join the survivors' 128-bit content fingerprints against the
  *     index parquet — only fingerprints travel, never document text;
  *  3. append the accepted fingerprints back to the index.
  *
  * 100 TB shape: the index holds one 16-byte fingerprint per distinct
  * document ever accepted — billions of rows but kilobyte-wide, and the
  * join is fingerprint⋈fingerprint. Partition the index directory by a
  * fingerprint prefix (`spark.read` prunes probe-side partitions) or
  * bucket both sides on `fp` to make the anti-join co-located; a Bloom
  * pre-filter (`ops.BloomJoin` pattern) cuts probe traffic when the
  * expected hit rate is low. Crash safety: the append in step 3 is the
  * only write — if a batch fails between output and index append, re-runs
  * re-admit the same documents (dedup is idempotent on re-ingest),
  * never lose them.
  */
object IncrementalDedup {

  private val FpCol = "fp"

  /** Dedup `batch` against (and update) the index at `indexDir`. Returns
    * the accepted rows — input columns plus the `fp` fingerprint column.
    * A missing/empty index directory means "first batch": everything
    * in-batch-distinct is accepted and seeds the index.
    */
  def ingest(
      batch: DataFrame,
      indexDir: String,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = batch.sparkSession
    val inBatch = Dedup.exactDedup(batch, idCol, textCol)
      .withColumn(FpCol, TextOps.fingerprint(col(textCol)))
    val accepted = readIndex(spark, indexDir) match {
      case Some(index) => inBatch.join(index, Seq(FpCol), "left_anti")
      case None        => inBatch
    }
    // materialize before the index append: the returned frame must not
    // re-execute AFTER its own fingerprints land in the index (it would
    // dedup against itself and come back empty)
    val pinned = accepted.localCheckpoint(true)
    pinned.select(col(FpCol)).write.mode(SaveMode.Append).parquet(indexDir)
    pinned
  }

  /** Distinct-document count of the index (monitoring). */
  def indexSize(spark: SparkSession, indexDir: String): Long =
    readIndex(spark, indexDir).map(_.count()).getOrElse(0L)

  /** NEAR-dup ingest against a persisted MinHash BAND-KEY index — the
    * batch-drop twin of `streaming.StatefulOps.nearDupHits` (which keys
    * the same band keys in stream state). Returns the batch rows with
    * `near_dup_hit`: true iff ANY of the doc's band keys was already in
    * the index, i.e. some previously ingested document agreed on a full
    * signature band — the standard LSH candidate criterion. All the
    * batch's band keys are then appended (hits too: their other bands
    * still index future near-dups).
    *
    * Index rows are `(band, bkey)` — a few dozen bytes × bands per
    * accepted document. Same scale notes as [[ingest]]: bucket or
    * prefix-partition on `bkey`; the join is keys⋈keys, text never
    * travels. IN-batch near-dup pairs are this op's non-goal — run
    * [[graft.ext.Dedup.minhashPairs]] on the batch for those; and since
    * the append is blind, keys recur across batches (semi-join semantics
    * are unaffected; compact the index with a periodic `distinct`
    * rewrite when it matters).
    */
  def ingestNearDup(
      batch: DataFrame,
      indexDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3
  ): DataFrame = {
    val spark = batch.sparkSession
    val keys = Dedup.bandKeys(
      Dedup.minhashSignatureArray(batch, idCol, textCol, numHashes, shingleN),
      numHashes, rowsPerBand) // (id, band, bkey)
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hitIds =
      if (fs.exists(path) && fs.listStatus(path).nonEmpty) {
        val index = spark.read.parquet(indexDir)
        keys.join(index, Seq("band", "bkey"), "left_semi")
          .select(col("id")).distinct()
      } else keys.sparkSession.emptyDataFrame
        .withColumn("id", lit(null).cast("long")).filter(lit(false))
    val flagged = batch.join(
        hitIds.withColumn("near_dup_hit", lit(true)),
        batch(idCol) === hitIds("id"), "left")
      .drop("id")
      .withColumn("near_dup_hit", coalesce(col("near_dup_hit"), lit(false)))
      .localCheckpoint(true) // pin BEFORE the append (same self-dedup trap)
    keys.select(col("band"), col("bkey")).distinct()
      .write.mode(SaveMode.Append).parquet(indexDir)
    flagged
  }

  private def readIndex(spark: SparkSession, dir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      Some(spark.read.parquet(dir).select(col(FpCol)))
    else None
  }
}
