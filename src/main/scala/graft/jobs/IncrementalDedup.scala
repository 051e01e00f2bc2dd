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
  *  1. ONE fingerprint pass over the batch (md5 materialized by an eager
  *     checkpoint — every downstream consumer reads the pinned bytes,
  *     never re-hashes document text);
  *  2. in-batch exact dedup ([[Dedup.exactDedupByKey]] over the pinned
  *     fingerprints — skew-safe groupBy + semi join);
  *  3. anti-join the survivors' fingerprints against the index parquet —
  *     only fingerprints travel, never document text; optionally through
  *     a Bloom pre-filter built over the batch's fingerprints that prunes
  *     the index side BEFORE its shuffle (`bloomFpp`);
  *  4. `persistOutput` writes the accepted rows DURABLY;
  *  5. only then are the accepted fingerprints appended to the index.
  *
  * Crash safety hinges on that ordering: the index append is LAST, so a
  * failure anywhere earlier leaves the index untouched and a re-run
  * re-admits the same documents (idempotent retry) — documents are never
  * lost. The flip side: on such a retry `persistOutput` RUNS AGAIN with
  * the same accepted rows, so the durable sink must itself be idempotent
  * (overwrite-by-batch-id, transactional commit, or downstream dedup) or
  * the output gains duplicate rows — the ordering guarantees at-least-once
  * output, not exactly-once. Callers that ignore `persistOutput` and
  * instead consume the returned frame accept the inverse risk: a crash
  * after the append but before their own write loses the batch (the retry
  * sees its fingerprints already indexed). The returned frame is
  * checkpoint-pinned so consuming it after the append cannot re-execute
  * the anti-join against its own fingerprints — but a `localCheckpoint`
  * is not fault-tolerant; durable output belongs in `persistOutput`.
  *
  * 100 TB shape: the index holds one 16-byte fingerprint per distinct
  * document ever accepted — billions of rows but kilobyte-wide, and the
  * join is fingerprint⋈fingerprint. Partition the index directory by a
  * fingerprint prefix (`spark.read` prunes probe-side partitions) or
  * bucket both sides on `fp` to make the anti-join co-located; the
  * `bloomFpp` pre-filter (`ops.BloomJoin` pattern) cuts the INDEX-side
  * shuffle to ~batch size when the expected hit rate is low.
  */
object IncrementalDedup {

  private val FpCol = "fp"
  // internal join-side columns, prefixed so they can never silently
  // collide with (and drop) caller data columns
  private val HitIdCol = "__graft_hit_id"
  private val FlagCol = "near_dup_hit"

  /** Dedup `batch` against (and update) the index at `indexDir`. Returns
    * the accepted rows — input columns plus the `fp` fingerprint column.
    * A missing/empty index directory means "first batch": everything
    * in-batch-distinct is accepted and seeds the index. NULL-text rows
    * are dropped up front (a null fingerprint can never match an
    * anti-join key, so they would bypass dedup and bloat the index by
    * one null per batch forever).
    *
    * @param persistOutput durable write of the accepted rows, executed
    *        BEFORE the index append (see the ordering contract above —
    *        it must tolerate re-running with the same rows on retry).
    * @param bloomFpp when set, build a Bloom filter over the BATCH's
    *        fingerprints (one cheap pass over the checkpointed batch) and
    *        prune the INDEX side with it before the anti-join — index
    *        rows whose fingerprint cannot occur in the batch are
    *        irrelevant to the decision, and Bloom filters have no false
    *        negatives, so results are exactly the plain path's. Worth it
    *        when the index dwarfs the batch (the steady state): the
    *        index-side shuffle drops from |index| to ~|batch| · (1+fpp).
    */
  def ingest(
      batch: DataFrame,
      indexDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      persistOutput: DataFrame => Unit = _ => (),
      bloomFpp: Option[Double] = None,
      autoCompact: Boolean = false
  ): DataFrame = {
    val spark = batch.sparkSession
    require(!batch.columns.contains(FpCol),
      s"batch already has a '$FpCol' column — it would be silently " +
        "overwritten by the fingerprint this operator appends; rename it")
    // the ONLY md5 pass over document bytes: fingerprints are materialized
    // here, and the dedup groupBy/semi-join plus the index anti-join all
    // read the pinned blocks
    val withFp = batch.filter(col(textCol).isNotNull)
      .withColumn(FpCol, TextOps.fingerprint(col(textCol)))
      .localCheckpoint(true)
    val inBatch = Dedup.exactDedupByKey(withFp, idCol, FpCol)
    val accepted = readIndex(spark, indexDir, Seq(FpCol)) match {
      case Some(index) =>
        val probed = bloomFpp match {
          case Some(fpp) =>
            val expected = math.max(withFp.count(), 1L) // off the checkpoint
            val bloom = withFp.stat.bloomFilter(FpCol, expected, fpp)
            val mightContain =
              udf((s: String) => s != null && bloom.mightContainString(s))
            index.filter(mightContain(col(FpCol)))
          case None => index
        }
        inBatch.join(probed, Seq(FpCol), "left_anti")
      case None => inBatch
    }
    val pinned = accepted.localCheckpoint(true)
    persistOutput(pinned) // durable output FIRST …
    pinned.select(col(FpCol)).write.mode(SaveMode.Append).parquet(indexDir) // … append LAST
    // compaction AFTER the append: a crash here just defers the rewrite
    // (the fp index never gains duplicate ROWS, so only maxFiles fires)
    if (autoCompact) maybeCompactIndex(spark, indexDir)
    pinned
  }

  /** Distinct-document count of the index (monitoring). */
  def indexSize(spark: SparkSession, indexDir: String): Long =
    readIndex(spark, indexDir, Seq(FpCol)).map(_.count()).getOrElse(0L)

  /** Run [[compactIndex]] iff the directory needs it: physical rows have
    * grown past `maxBloatRatio` × the distinct estimate (the near-dup
    * band-key append is blind, so repeated keys pile up batch over
    * batch), OR the directory holds more than `maxFiles` parquet files
    * (the exact-fp append never duplicates rows but adds files every
    * batch — the classic small-files decay). Returns true iff a
    * compaction ran. Cost when it doesn't fire: one FS listing, a
    * parquet metadata row count, and one `approx_count_distinct` scan of
    * the (narrow, key-only) index — cheap next to the ingest join that
    * just scanned the same rows. The distinct estimate errs a few
    * percent either way, which only shifts WHEN compaction runs, never
    * its correctness.
    */
  def maybeCompactIndex(spark: SparkSession, indexDir: String,
                        maxBloatRatio: Double = 4.0,
                        maxFiles: Int = 512): Boolean = {
    val (fs, live) = fsAndPath(spark, indexDir)
    recoverSwap(fs, live)
    if (!fs.exists(live)) return false
    val nFiles = fs.listStatus(live)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (nFiles == 0) return false
    val df = spark.read.parquet(indexDir)
    val physical = df.count() // parquet footer metadata, no data scan
    val trigger = nFiles > maxFiles || {
      val est = df.select(approx_count_distinct(
        concat_ws("\u0001", df.columns.toIndexedSeq.map(col): _*)).as("d")).first().getLong(0)
      physical.toDouble >= maxBloatRatio * math.max(est, 1L).toDouble
    }
    if (trigger) compactIndex(spark, indexDir)
    trigger
  }

  /** NEAR-dup ingest against a persisted MinHash BAND-KEY index — the
    * batch-drop twin of `streaming.StatefulOps.nearDupHits` (which keys
    * the same band keys in stream state). Returns the batch rows with
    * `near_dup_hit`: true iff ANY of the doc's band keys was already in
    * the index — i.e. some previously ingested document agreed on a full
    * signature band, the standard LSH candidate criterion — or (with
    * `flagInBatch`, the default) collides with a LOWER-id document of the
    * SAME batch, matching the cross-batch "earlier doc wins" convention.
    * All the batch's band keys are then appended (hits too: their other
    * bands still index future near-dups).
    *
    * BEHAVIOR NOTE — `flagInBatch = true` is a deliberate default flip:
    * in-batch duplicates were previously a documented NON-goal of this
    * operator. A caller that separately runs [[graft.ext.Dedup.minhashPairs]]
    * on the batch to handle in-batch pairs will now see those duplicates
    * flagged twice (once here, once in its own pair pass) — pass
    * `flagInBatch = false` to restore the cross-batch-only semantics.
    *
    * Documents with fewer than `shingleN` tokens have no shingles and
    * therefore no LSH bands; they are indexed under a synthetic band −1
    * keyed by content fingerprint, so EXACT copies of short docs still
    * flag — across batches AND (via the same in-batch collision rule)
    * within one (true near-dups of short docs are out of LSH's reach —
    * that is inherent to shingle-based signatures, not a bug).
    *
    * Index rows are `(band, bkey)` — a few dozen bytes × bands per
    * accepted document. Same ordering contract as [[ingest]]:
    * `persistOutput` runs before the key append, so failed batches
    * retry cleanly (and re-run `persistOutput` with the same rows — see
    * the at-least-once caveat above); consuming only the returned frame
    * risks a re-run flagging the batch against its own keys. Same scale
    * notes too: bucket or prefix-partition on `bkey`; only keys travel,
    * never text; `bloomFpp` prunes the index side of the semi join with a
    * Bloom filter over the batch's (band, bkey) keys — exact results, and
    * the steady-state index shuffle shrinks to ~|batch keys|·(1+fpp). The
    * append is blind, so keys recur across batches — semi-join semantics
    * are unaffected; pass `autoCompact = true` to have each ingest call
    * [[maybeCompactIndex]] after its append (compaction fires only once
    * the bloat ratio or file count warrants it), or run [[compactIndex]]
    * on your own cadence.
    */
  def ingestNearDup(
      batch: DataFrame,
      indexDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3,
      persistOutput: DataFrame => Unit = _ => (),
      flagInBatch: Boolean = true,
      bloomFpp: Option[Double] = None,
      autoCompact: Boolean = false
  ): DataFrame = {
    val spark = batch.sparkSession
    require(!batch.columns.contains(FlagCol),
      s"batch already has a '$FlagCol' column — it would collide with " +
        "the flag this operator appends; rename it")
    val docs = batch.filter(col(textCol).isNotNull)
    // token-count predicate ⟺ empty shingle set (see minhashSignatureArray:
    // a shingle-emptiness filter would build the shingle array just to
    // test it, twice per row after pushdown)
    val shortDocKeys = docs
      .filter(size(TextOps.tokens(col(textCol))) < shingleN)
      .select(col(idCol).as("id"), lit(-1).cast("int").as("band"),
        TextOps.fingerprint(col(textCol)).cast("string").as("bkey"))
    // one checkpoint, three consumers (semi-join probe + in-batch collision
    // check + index append): uncached, the signature+banding scan would
    // execute once per consumer
    val keys = Dedup.bandKeys(
        Dedup.minhashSignatureArray(docs, idCol, textCol, numHashes, shingleN),
        numHashes, rowsPerBand)
      .select(col("id"), col("band").cast("int").as("band"), col("bkey"))
      .union(shortDocKeys)
      .localCheckpoint(true) // (id, band, bkey)
    val crossBatchHits = readIndex(spark, indexDir, Seq("band", "bkey")) match {
      case Some(index) =>
        // same bloom trade as [[ingest]], on the composite (band, bkey):
        // the band-key index is the fastest-growing one, and index rows
        // whose key no batch document carries cannot affect the semi join
        val probed = bloomFpp match {
          case Some(fpp) =>
            val keyStr = concat_ws(":", col("band"), col("bkey"))
            val expected = math.max(keys.count(), 1L) // off the checkpoint
            val bloom = keys.select(keyStr.as("__k")).stat
              .bloomFilter("__k", expected, fpp)
            val mightContain =
              udf((s: String) => s != null && bloom.mightContainString(s))
            index.filter(mightContain(keyStr))
          case None => index
        }
        keys.join(probed, Seq("band", "bkey"), "left_semi").select(col("id"))
      case None => spark.emptyDataFrame
        .withColumn("id", lit(null).cast("long")).filter(lit(false))
    }
    // in-batch collisions: ids sharing a (band, bkey) with a smaller id of
    // the same batch — one aggregate + join over the pinned keys, the same
    // skew-safe groupBy shape as exactDedup (never a window over bkey)
    val hitIds = (if (flagInBatch) {
      val mins = keys.groupBy("band", "bkey").agg(min(col("id")).as("__graft_min"))
      crossBatchHits.union(
        keys.join(mins, Seq("band", "bkey"))
          .filter(col("id") > col("__graft_min"))
          .select(col("id")))
    } else crossBatchHits).distinct()
    val flagged = batch.join(
        hitIds.select(col("id").as(HitIdCol), lit(true).as(FlagCol)),
        batch(idCol) === col(HitIdCol), "left")
      .drop(HitIdCol)
      .withColumn(FlagCol, coalesce(col(FlagCol), lit(false)))
      .localCheckpoint(true) // pin BEFORE the append (same self-dedup trap)
    persistOutput(flagged) // durable output FIRST …
    keys.select(col("band"), col("bkey")).distinct()
      .write.mode(SaveMode.Append).parquet(indexDir) // … append LAST
    // the band-key append IS blind (keys recur batch over batch), so the
    // bloat-ratio trigger is the one doing the work here; runs after the
    // append so a crash mid-compaction costs nothing but deferred cleanup
    if (autoCompact) maybeCompactIndex(spark, indexDir)
    flagged
  }

  /** Compact the index at `indexDir`: rewrite it with duplicate rows
    * removed. The near-dup band-key append is blind, so an index row
    * recurs once per batch that re-emits its key and the directory grows
    * monotonically even when the KEY set doesn't; ingest decisions are
    * unaffected (semi/anti-join semantics), so compaction is purely a
    * size/scan-cost rewrite — run it on whatever cadence the index growth
    * curve demands. Works on both index shapes (`fp` and `(band, bkey)`):
    * it distincts whole rows.
    *
    * Crash-safe by write-temp-then-swap: the compacted copy is fully
    * written to `<dir>.compacting` first, the live index is moved aside
    * to `<dir>.old`, the copy moves in, and only then is the backup
    * dropped. On a filesystem with ATOMIC rename (HDFS, local, ABFS) a
    * crash at ANY step leaves either the live index or the `.old` backup
    * intact, and [[ingest]]/[[ingestNearDup]]/the next compaction run the
    * recovery automatically (restore `.old` if the swap lost the live
    * directory, drop it if the swap completed). On object stores whose
    * "rename" is a non-atomic copy+delete (S3A), that guarantee does NOT
    * hold — a crash mid-rename can leave a partial directory; run
    * compaction against such stores only with an atomic-commit layer
    * (e.g. an HDFS staging dir) or accept re-ingesting from the last
    * durable output. A rename that returns false (rather than throwing)
    * aborts loudly below instead of leaving a silent half-swap.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val (fs, live) = fsAndPath(spark, indexDir)
    recoverSwap(fs, live)
    if (!fs.exists(live) || fs.listStatus(live).isEmpty) return
    val tmp = compactingPath(live)
    val old = backupPath(live)
    spark.read.parquet(indexDir).distinct()
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: live → .old, .compacting → live, drop .old. HDFS-style
    // FileSystems signal rename failure via `false` as often as via an
    // exception — an unchecked false here would strand the index half-
    // swapped with no error, so both renames are checked
    def renameOrDie(from: org.apache.hadoop.fs.Path,
                    to: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(from, to)) throw new java.io.IOException(
        s"compactIndex: rename $from -> $to returned false; " +
          "index left recoverable (live or .old backup intact)")
    renameOrDie(live, old)
    renameOrDie(tmp, live)
    fs.delete(old, true)
  }

  private def compactingPath(live: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".compacting")
  private def backupPath(live: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(live.getParent, live.getName + ".old")

  /** Heal the two crash windows of [[compactIndex]]'s swap (idempotent):
    *  - live missing + `.old` present → the crash hit between move-out
    *    and move-in; restore the backup (the `.compacting` copy may also
    *    be complete, but the backup is the conservative choice — a
    *    superset, identical join semantics);
    *  - live present + `.old` present → the crash hit after move-in;
    *    the backup is redundant, drop it.
    * A lone `.compacting` directory is an incomplete copy; the next
    * compaction overwrites it.
    */
  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                          live: org.apache.hadoop.fs.Path): Unit = {
    val old = backupPath(live)
    if (fs.exists(old)) {
      if (fs.exists(live)) fs.delete(old, true)
      else fs.rename(old, live)
    }
  }

  private def fsAndPath(spark: SparkSession, dir: String) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  private def readIndex(spark: SparkSession, dir: String,
                        cols: Seq[String]): Option[DataFrame] = {
    val (fs, path) = fsAndPath(spark, dir)
    recoverSwap(fs, path) // a crashed compaction must never break ingest
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      Some(spark.read.parquet(dir).select(cols.map(col): _*))
    else None
  }
}
