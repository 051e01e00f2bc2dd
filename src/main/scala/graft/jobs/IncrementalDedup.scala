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
  *  3. `persistOutput` writes the accepted rows DURABLY;
  *  4. only then are the accepted fingerprints appended to the index.
  *
  * Crash safety hinges on that ordering: the index append is LAST, so a
  * failure anywhere earlier leaves the index untouched and a re-run
  * re-admits the same documents (idempotent retry) — documents are never
  * lost. Callers that ignore `persistOutput` and instead consume the
  * returned frame accept the inverse risk: a crash after the append but
  * before their own write loses the batch (the retry sees its
  * fingerprints already indexed). The returned frame is checkpoint-pinned
  * so consuming it after the append cannot re-execute the anti-join
  * against its own fingerprints — but a `localCheckpoint` is not
  * fault-tolerant; durable output belongs in `persistOutput`.
  *
  * 100 TB shape: the index holds one 16-byte fingerprint per distinct
  * document ever accepted — billions of rows but kilobyte-wide, and the
  * join is fingerprint⋈fingerprint. Partition the index directory by a
  * fingerprint prefix (`spark.read` prunes probe-side partitions) or
  * bucket both sides on `fp` to make the anti-join co-located; a Bloom
  * pre-filter (`ops.BloomJoin` pattern) cuts probe traffic when the
  * expected hit rate is low.
  */
object IncrementalDedup {

  private val FpCol = "fp"

  /** Dedup `batch` against (and update) the index at `indexDir`. Returns
    * the accepted rows — input columns plus the `fp` fingerprint column.
    * A missing/empty index directory means "first batch": everything
    * in-batch-distinct is accepted and seeds the index. NULL-text rows
    * are dropped up front (a null fingerprint can never match an
    * anti-join key, so they would bypass dedup and bloat the index by
    * one null per batch forever).
    *
    * @param persistOutput durable write of the accepted rows, executed
    *        BEFORE the index append (see the ordering contract above).
    */
  def ingest(
      batch: DataFrame,
      indexDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      persistOutput: DataFrame => Unit = _ => ()
  ): DataFrame = {
    val spark = batch.sparkSession
    val inBatch = Dedup.exactDedup(batch.filter(col(textCol).isNotNull), idCol, textCol)
      .withColumn(FpCol, TextOps.fingerprint(col(textCol)))
    val accepted = readIndex(spark, indexDir, Seq(FpCol)) match {
      case Some(index) => inBatch.join(index, Seq(FpCol), "left_anti")
      case None        => inBatch
    }
    val pinned = accepted.localCheckpoint(true)
    persistOutput(pinned) // durable output FIRST …
    pinned.select(col(FpCol)).write.mode(SaveMode.Append).parquet(indexDir) // … append LAST
    pinned
  }

  /** Distinct-document count of the index (monitoring). */
  def indexSize(spark: SparkSession, indexDir: String): Long =
    readIndex(spark, indexDir, Seq(FpCol)).map(_.count()).getOrElse(0L)

  /** NEAR-dup ingest against a persisted MinHash BAND-KEY index — the
    * batch-drop twin of `streaming.StatefulOps.nearDupHits` (which keys
    * the same band keys in stream state). Returns the batch rows with
    * `near_dup_hit`: true iff ANY of the doc's band keys was already in
    * the index, i.e. some previously ingested document agreed on a full
    * signature band — the standard LSH candidate criterion. All the
    * batch's band keys are then appended (hits too: their other bands
    * still index future near-dups).
    *
    * Documents with fewer than `shingleN` tokens have no shingles and
    * therefore no LSH bands; they are indexed under a synthetic band −1
    * keyed by content fingerprint, so EXACT cross-batch copies of short
    * docs still flag (true near-dups of short docs are out of LSH's
    * reach — that is inherent to shingle-based signatures, not a bug).
    *
    * Index rows are `(band, bkey)` — a few dozen bytes × bands per
    * accepted document. Same ordering contract as [[ingest]]:
    * `persistOutput` runs before the key append, so failed batches
    * retry cleanly; consuming only the returned frame risks a re-run
    * flagging the batch against its own keys. Same scale notes too:
    * bucket or prefix-partition on `bkey`; only keys travel, never
    * text. IN-batch near-dup pairs are this op's non-goal — run
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
      shingleN: Int = 3,
      persistOutput: DataFrame => Unit = _ => ()
  ): DataFrame = {
    val spark = batch.sparkSession
    val docs = batch.filter(col(textCol).isNotNull)
    val shortDocKeys = docs
      .select(col(idCol).as("id"), col(textCol).as("__t"),
        TextOps.shingleSet(col(textCol), shingleN).as("shs"))
      .filter(size(col("shs")) === 0)
      .select(col("id"), lit(-1).cast("int").as("band"),
        TextOps.fingerprint(col("__t")).cast("string").as("bkey"))
    // one checkpoint, two consumers (semi-join probe + index append):
    // uncached, the signature+banding scan would execute twice
    val keys = Dedup.bandKeys(
        Dedup.minhashSignatureArray(docs, idCol, textCol, numHashes, shingleN),
        numHashes, rowsPerBand)
      .select(col("id"), col("band").cast("int").as("band"), col("bkey"))
      .union(shortDocKeys)
      .localCheckpoint(true) // (id, band, bkey)
    val hitIds = readIndex(spark, indexDir, Seq("band", "bkey")) match {
      case Some(index) =>
        keys.join(index, Seq("band", "bkey"), "left_semi")
          .select(col("id")).distinct()
      case None => spark.emptyDataFrame
        .withColumn("id", lit(null).cast("long")).filter(lit(false))
    }
    val flagged = batch.join(
        hitIds.withColumn("near_dup_hit", lit(true)),
        batch(idCol) === hitIds("id"), "left")
      .drop("id")
      .withColumn("near_dup_hit", coalesce(col("near_dup_hit"), lit(false)))
      .localCheckpoint(true) // pin BEFORE the append (same self-dedup trap)
    persistOutput(flagged) // durable output FIRST …
    keys.select(col("band"), col("bkey")).distinct()
      .write.mode(SaveMode.Append).parquet(indexDir) // … append LAST
    flagged
  }

  private def readIndex(spark: SparkSession, dir: String,
                        cols: Seq[String]): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      Some(spark.read.parquet(dir).select(cols.map(col): _*))
    else None
  }
}
