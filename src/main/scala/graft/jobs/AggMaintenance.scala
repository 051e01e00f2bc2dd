package graft.jobs

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — a materialized per-key aggregate
  * table kept current batch-over-batch, the fourth persisted-state
  * protocol next to `DimensionSync` (SCD2), `IncrementalDedup`
  * (fingerprint index) and `CorpusCuration.curateAtIngest` (streaming
  * gate): full rebuilds of a 100 TB fact table per batch drop are not an
  * option, so each batch folds into the running state instead.
  *
  * Only MERGEABLE metrics are maintained — additive sums (counts are
  * sums of 1), mins, and maxs over BIGINT columns — so folding a batch
  * is a key-partitioned full-outer join + per-column combine, and the
  * final state is provably identical to a from-scratch rebuild for ANY
  * split of the input into batches (the monoid laws; pinned by
  * `AggMaintenanceSpec`'s split-invariance test). Non-mergeable exact
  * metrics (count-distinct, medians) intentionally do not fit this
  * seam: they need their value-set carried in state (the sketch twins —
  * HLL / CMS — live in `ops.Sketches`).
  *
  * State layout and crash protocol (single-writer):
  * {{{
  *   stateDir/_CURRENT          <- text file naming the live version, "v12"
  *   stateDir/v12/agg/          <- the aggregate table (parquet)
  *   stateDir/v12/ledger/       <- applied batch ids (parquet, one column)
  * }}}
  * `applyBatch` writes the NEXT version directory completely (agg +
  * ledger including the new batch id), then commits by atomically
  * renaming a temp pointer file onto `_CURRENT`. The two crash windows:
  *  - crash BEFORE the pointer flip: `_CURRENT` still names the old
  *    version; the retry overwrites the orphan directory
  *    (`SaveMode.Overwrite`) and re-commits — idempotent;
  *  - crash AFTER the flip: the ledger inside the live version already
  *    holds the batch id, so the retry is a detected no-op (returns
  *    false, touches nothing).
  * Together: exactly-once state maintenance under an at-least-once
  * driver. The atomic-rename commit assumes a filesystem with atomic
  * rename (POSIX, HDFS); object stores need the usual
  * metastore/commit-service stand-in.
  *
  * 100 TB shape: state is ONE row per key (narrow BIGINTs), the fold is
  * one shuffle of the batch aggregate plus one of the state — bucket
  * both the state table and the batch aggregate on the key to make the
  * outer join co-located, and prune old `v*` directories with a
  * retention sweep (they are free time travel until then). The ledger
  * stays kilobytes (one row per batch ever applied).
  */
object AggMaintenance {

  /** Which columns merge how. All metric columns must be BIGINT (exact
    * integer units — fixed-point for money/values); `keys` are the
    * grouping columns. Every metric column must appear in exactly one
    * bucket.
    */
  final case class MergeSpec(
      keys: Seq[String],
      sums: Seq[String],
      mins: Seq[String] = Seq.empty,
      maxs: Seq[String] = Seq.empty) {
    def metrics: Seq[String] = sums ++ mins ++ maxs
  }

  private def currentVersion(stateDir: String): Int = {
    val p = Paths.get(stateDir, "_CURRENT")
    if (Files.exists(p)) Files.readString(p).trim.stripPrefix("v").toInt else 0
  }

  /** The live aggregate table (empty-schema-less None at version 0). */
  def current(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val v = currentVersion(stateDir)
    if (v == 0) None else Some(spark.read.parquet(s"$stateDir/v$v/agg"))
  }

  private def appliedBatches(spark: SparkSession, stateDir: String, v: Int): Set[String] =
    if (v == 0) Set.empty
    else spark.read.parquet(s"$stateDir/v$v/ledger")
      .collect().map(_.getString(0)).toSet

  /** Fold one batch of RAW metric rows (pre-projected to `spec.keys` ++
    * `spec.metrics`, one row per fact) into the state at `stateDir`.
    * Returns true if the batch was applied, false if `batchId` is
    * already in the ledger (a retry after a successful commit — no-op).
    */
  def applyBatch(
      spark: SparkSession,
      batch: DataFrame,
      stateDir: String,
      batchId: String,
      spec: MergeSpec
  ): Boolean = {
    require(batchId.nonEmpty && !batchId.contains("\n"), s"bad batchId: $batchId")
    Files.createDirectories(Paths.get(stateDir))
    val v = currentVersion(stateDir)
    val applied = appliedBatches(spark, stateDir, v)
    if (applied.contains(batchId)) return false

    val aggExprs =
      spec.sums.map(c => sum(col(c)).as(c)) ++
        spec.mins.map(c => min(col(c)).as(c)) ++
        spec.maxs.map(c => max(col(c)).as(c))
    val batchAgg = batch
      .select((spec.keys ++ spec.metrics).map(col): _*)
      .groupBy(spec.keys.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)

    val merged = current(spark, stateDir) match {
      case None => batchAgg
      case Some(state) =>
        val s = spec.metrics.foldLeft(state)((d, c) => d.withColumnRenamed(c, s"__s_$c"))
        val b = spec.metrics.foldLeft(batchAgg)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
        val combined =
          spec.sums.map(c =>
            (coalesce(col(s"__s_$c"), lit(0L)) + coalesce(col(s"__b_$c"), lit(0L))).as(c)) ++
            spec.mins.map(c => least(col(s"__s_$c"), col(s"__b_$c")).as(c)) ++
            spec.maxs.map(c => greatest(col(s"__s_$c"), col(s"__b_$c")).as(c))
        s.join(b, spec.keys, "full_outer")
          .select(spec.keys.map(col) ++ combined: _*)
    }

    commitVersion(spark, merged, stateDir, v + 1, applied + batchId)
    true
  }

  /** Write version `next` completely (agg + ledger), then flip the
    * pointer atomically. Overwrite clobbers any orphan directory a
    * crashed attempt left.
    */
  private def commitVersion(
      spark: SparkSession,
      table: DataFrame,
      stateDir: String,
      next: Int,
      applied: Set[String]): Unit = {
    table.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/v$next/agg")
    import spark.implicits._
    applied.toSeq.sorted.toDF("batch_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$stateDir/v$next/ledger")
    val tmp = Paths.get(stateDir, s"_CURRENT.tmp.$next")
    Files.writeString(tmp, s"v$next")
    Files.move(tmp, Paths.get(stateDir, "_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Retraction fold — the GDPR-erasure / late-correction arm. The
    * batch carries SIGNED delta rows (`signCol` = +1 insert, −1
    * retract); sum metrics fold as `Σ sign·value`, and a key whose
    * designated support count (`countCol`, one of `spec.sums` — the
    * "number of live facts" column) reaches ZERO is REMOVED from the
    * state, which is what makes [[changes]]' `delete` op reachable.
    *
    * Min/max metrics are structurally NOT retractable — removing the
    * current extremum needs the value multiset, not a scalar — so this
    * entry point requires a sums-only spec; state that must track
    * extrema under deletion re-aggregates from the fact log instead
    * (or keeps a bounded top-k multiset, a different operator). The
    * fold REJECTS batches that would drive any support count negative
    * (a malformed retract stream) before committing anything, so a bad
    * producer cannot poison the state. Ledger/commit protocol is
    * [[applyBatch]]'s, unchanged.
    */
  def applyDeltas(
      spark: SparkSession,
      deltas: DataFrame,
      stateDir: String,
      batchId: String,
      spec: MergeSpec,
      countCol: String,
      signCol: String = "sign"
  ): Boolean = {
    require(spec.mins.isEmpty && spec.maxs.isEmpty,
      "min/max are not retractable; applyDeltas needs a sums-only spec")
    require(spec.sums.contains(countCol), s"countCol $countCol must be a sum metric")
    require(batchId.nonEmpty && !batchId.contains("\n"), s"bad batchId: $batchId")
    Files.createDirectories(Paths.get(stateDir))
    val v = currentVersion(stateDir)
    val applied = appliedBatches(spark, stateDir, v)
    if (applied.contains(batchId)) return false

    val batchAgg = deltas
      .select((spec.keys.map(col) ++
        spec.sums.map(c => (col(c) * col(signCol)).as(c))): _*)
      .groupBy(spec.keys.map(col): _*)
      .agg(sum(col(spec.sums.head)).as(spec.sums.head),
        spec.sums.tail.map(c => sum(col(c)).as(c)): _*)

    val merged = (current(spark, stateDir) match {
      case None => batchAgg
      case Some(state) =>
        val s = spec.sums.foldLeft(state)((d, c) => d.withColumnRenamed(c, s"__s_$c"))
        val b = spec.sums.foldLeft(batchAgg)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
        s.join(b, spec.keys, "full_outer")
          .select(spec.keys.map(col) ++ spec.sums.map(c =>
            (coalesce(col(s"__s_$c"), lit(0L)) + coalesce(col(s"__b_$c"), lit(0L))).as(c)): _*)
    }).localCheckpoint() // pin: validated bytes are the committed bytes
    val negatives = merged.filter(col(countCol) < 0).count()
    require(negatives == 0L,
      s"batch $batchId would drive $negatives keys' $countCol negative; rejected")
    val live = merged.filter(col(countCol) > 0)

    commitVersion(spark, live, stateDir, v + 1, applied + batchId)
    true
  }

  /** At-ingest twin: maintain the state from a STREAM of fact rows
    * (pre-projected to `spec.keys ++ spec.metrics` like [[applyBatch]])
    * through `foreachBatch`. `foreachBatch` is at-least-once — after a
    * crash between the state commit and the checkpoint commit, the same
    * epoch replays — but the epoch id becomes the ledger batch id, so
    * the replay is detected and skipped: the ledger turns Spark's
    * at-least-once into exactly-once state maintenance, the same
    * end-to-end idempotence `DimensionSync` gets from its commit
    * markers. Restarting from the checkpoint resumes the epoch
    * sequence; `StreamingAggMaintenanceSpec` pins cross-restart state
    * equality with the one-shot batch aggregate.
    */
  def maintainStream(
      facts: DataFrame,
      stateDir: String,
      checkpointDir: String,
      spec: MergeSpec
  ): org.apache.spark.sql.streaming.StreamingQuery =
    facts.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyBatch(batch.sparkSession, batch, stateDir, s"epoch-$epochId", spec)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Change data feed between two retained versions of the state — the
    * CDC view a downstream consumer (cache invalidation, search-index
    * refresh, reverse ETL) reads instead of diffing full snapshots
    * itself. Version directories ARE the time travel; this walks two of
    * them with one key-partitioned full-outer join and emits one row
    * per key whose metrics changed:
    *   `op = 'insert'` (key absent at `fromV`), `'update'` (any metric
    *   differs), `'delete'` (key absent at `toV` — unreachable under
    *   pure folding, which never drops keys, but emitted for state
    *   produced by retention/GDPR rewrites). Unchanged keys are
    *   filtered out. Columns: keys, `op`, then the `toV` metric values
    *   (NULL on delete). `fromV = 0` means "before anything": every key
    *   emits as an insert.
    */
  def changes(
      spark: SparkSession,
      stateDir: String,
      fromV: Int,
      toV: Int,
      spec: MergeSpec
  ): DataFrame = {
    require(0 <= fromV && fromV < toV && toV <= currentVersion(stateDir),
      s"need 0 <= fromV < toV <= current, got $fromV -> $toV")
    val newer = spark.read.parquet(s"$stateDir/v$toV/agg")
    val older =
      if (fromV == 0) newer.limit(0)
      else spark.read.parquet(s"$stateDir/v$fromV/agg")
    val o = spec.metrics.foldLeft(older)((d, c) => d.withColumnRenamed(c, s"__o_$c"))
      .withColumn("__o_present", lit(true))
    val n = spec.metrics.foldLeft(newer)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
      .withColumn("__n_present", lit(true))
    val differs = spec.metrics
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    o.join(n, spec.keys, "full_outer")
      .withColumn("op",
        when(col("__o_present").isNull, lit("insert"))
          .when(col("__n_present").isNull, lit("delete"))
          .when(differs, lit("update")))
      .filter(col("op").isNotNull)
      .select(spec.keys.map(col) ++ (col("op") +:
        spec.metrics.map(c => col(s"__n_$c").as(c))): _*)
  }
}
