package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, VectorOps}

/** Deduplication operators (north-star extensions, SURVEY.md §2.4): exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one hash-shuffle on the content key;
  *  - MinHash/LSH is the scale path for near-dup: signatures are a linear
  *    scan + one (doc,band) shuffle; candidate pairs come from equi-joins
  *    on band keys — never an all-pairs product;
  *  - `jaccardPairs` (token-join) and `embeddingNearDupPairs` (all-pairs)
  *    are exact small/medium-scale verifiers for the approximate paths.
  */
object Dedup {

  /** Default document-frequency cap for the exact shingle-intersection
    * family ([[jaccardPairs]]/[[containmentPairs]]): a shingle present
    * in more than this many documents is dropped from the intersection
    * counts before any pair materializes. 1000 members is ~500k pair
    * increments per hot bucket — bounded work — while a corpus-scale
    * boilerplate trigram under an uncapped default would explode
    * quadratically. Uncapped (`Int.MaxValue`) is the explicit opt-in
    * for verifier runs.
    */
  val DefaultShingleBucketCap: Int = 1000

  /** All ordered pairs (a<b) from a SORTED `ids` array column — used to
    * emit candidate pairs inside a bucket without a second scan of the
    * corpus (a self-join would recompute the whole upstream pipeline per
    * side). Two chained generators (posexplode, then explode of the
    * array's tail slice) — both run inside whole-stage codegen, where the
    * equivalent `flatten(transform(...transform(slice(...))))` lambda
    * formulation evaluates interpreted and allocates a fresh slice per
    * element (measured ~0.4 s of the q35 bench time at sf0.1).
    */
  private def explodePairs(buckets: DataFrame): DataFrame =
    buckets
      .select(posexplode(col("ids")).as(Seq("i", "id_a")), col("ids"))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))

  /** [[explodePairs]] over an `ids: array<struct<id, n, rk>>` bucket
    * column — emits `(id_a, na, rka, id_b, nb, rkb)` so the PPJoin size
    * AND positional predicates can run on the raw in-bucket pairs before
    * any dedup or join (`rk` = the member's prefix rank at this bucket's
    * shingle, i.e. its 1-based position in the doc's canonical (df, h)
    * order). Pair order matches [[explodePairs]]: the array is sorted by
    * (id, n, rk) = by id (one entry per id per bucket), so `id_a` sorts
    * before `id_b`.
    */
  private def explodePairsWithSize(buckets: DataFrame): DataFrame =
    buckets
      .select(posexplode(col("ids")).as(Seq("i", "pa")), col("ids"))
      .select(col("pa.id").as("id_a"), col("pa.n").as("na"),
        col("pa.rk").as("rka"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("pb"))
      .select(col("id_a"), col("na"), col("rka"),
        col("pb.id").as("id_b"), col("pb.n").as("nb"), col("pb.rk").as("rkb"))

  // ---------------------------------------------------------------- exact

  /** Exact-dup groups: one row per distinct content with the id kept
    * (lowest) and the number of copies. Deterministic, unlike
    * `dropDuplicates` which keeps an arbitrary row.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup keeping the lowest-id row of each content group — the
    * SKEW-SAFE formulation: `groupBy(fingerprint).agg(min(id))` builds the
    * keep set with MAP-SIDE PARTIAL aggregation (a hot fingerprint
    * collapses to one row per task before the shuffle), then a semi join
    * on (fingerprint, id) keeps exactly those rows. The join key pairs the
    * fingerprint WITH the id, so even the join shuffle spreads a hot
    * group across its copies' distinct ids — a boilerplate document
    * duplicated 10⁸× never lands on one straggler task. (The
    * `Window.partitionBy(fp)` min this replaces placed EVERY copy of one
    * fingerprint in a single `WindowExec` task.)
    *
    * Cost of skew immunity: the input is consumed twice (keep-set build +
    * probe), recomputing the fingerprint on each side. Callers that
    * materialize a fingerprint column anyway should dedup through
    * [[exactDedupByKey]] over a cached/checkpointed frame — one hash pass
    * total (see `jobs.IncrementalDedup.ingest`).
    *
    * NULL-`textCol` rows form one group (null-safe key equality), matching
    * the window formulation this replaces.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    exactDedupByKey(docs.withColumn(GroupKey, TextOps.fingerprint(col(textCol))),
      idCol, GroupKey).drop(GroupKey)

  /** Internal fingerprint column of [[exactDedup]]/[[exactDedupCounted]];
    * prefixed so it can't silently collide with caller data.
    */
  private val GroupKey = "__graft_fp"

  /** Word-order-insensitive exact dedup: the group key is the md5 of the
    * doc's SORTED token multiset, so two documents with the same words in
    * any order (and any single-space layout) collapse to one group —
    * the standard normalization notch between byte-exact dedup and
    * MinHash near-dup (catches shuffled boilerplate lists, reordered
    * key-value dumps, CSV row permutations that byte-exact misses but
    * that aren't "near" duplicates so much as literal ones). Keeps the
    * lowest-id row per group via the same skew-safe
    * groupBy + (key, id) semi-join as [[exactDedup]]; the sort is
    * per-row over that row's own tokens (codegen'd `sort_array`), so the
    * operator stays one projection + the exact-dedup shuffles — linear
    * at any corpus size.
    *
    * NULL-`textCol` rows keep a NULL key (one group under the semi-join's
    * null-safe equality, same as [[exactDedup]]) — without the guard,
    * `concat_ws` would silently swallow the null token array and merge
    * NULL-text docs with empty-text docs.
    */
  def exactDedupBagOfWords(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame =
    exactDedupByKey(
      docs.withColumn(GroupKey,
        when(col(textCol).isNotNull,
          md5(concat_ws(" ", sort_array(TextOps.tokens(col(textCol))))))),
      idCol, GroupKey).drop(GroupKey)

  /** [[exactDedup]] over a caller-materialized group-key column (skip the
    * in-flight fingerprint computation): keeps the lowest-`idCol` row of
    * every `keyCol` group, all input columns intact. Same skew-safe
    * groupBy + (key, id) semi-join shape as [[exactDedup]] — point it at a
    * cached or checkpointed frame and the key bytes are hashed exactly
    * once for the whole dedup.
    */
  def exactDedupByKey(docs: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val keeps = docs.groupBy(col(keyCol).as("__graft_kfp"))
      .agg(min(col(idCol)).as("__graft_keep"))
    docs.join(keeps,
      col(keyCol) <=> col("__graft_kfp") && col(idCol) === col("__graft_keep"),
      "left_semi")
  }

  /** [[exactDedup]] that also carries `n_copies` (the duplicate-group
    * size) on each kept row — same skew-safe aggregate, carried through an
    * inner join instead of a semi join. Lets a pipeline recover the
    * pre-dedup row count as `sum(n_copies)` from the deduped (and
    * typically cached) output instead of a second scan of the input (see
    * `jobs.CorpusCuration`).
    *
    * PRECONDITION: `idCol` must be unique across the input (as it is for
    * `documents.doc_id`). If two rows of one fingerprint group tie on the
    * minimum id, both survive the (fingerprint, min-id) join (exactly
    * like [[exactDedup]]) and EACH carries the full group size, so
    * `sum(n_copies)` — and hence `CorpusCuration.Stats.input` — would
    * overcount the true input row count.
    */
  def exactDedupCounted(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val withFp = docs.withColumn(GroupKey, TextOps.fingerprint(col(textCol)))
    val keeps = withFp.groupBy(col(GroupKey).as("__graft_kfp"))
      .agg(min(col(idCol)).as("__graft_keep"), count(lit(1)).as("n_copies"))
    withFp.join(keeps,
      col(GroupKey) <=> col("__graft_kfp") && col(idCol) === col("__graft_keep"))
      .select(docs.columns.toIndexedSeq.map(col) :+ col("n_copies"): _*)
  }

  /** Duplication observability report: exact-dup rate per dimension
    * combination plus rollup subtotals — the "which sources are
    * flooding us with copies" dashboard every recurring crawl ingest
    * watches (a dup-rate SPIKE on one source is the canonical signal of
    * a scraper loop or a mirror site joining the crawl). A doc is a dup
    * iff it is not the min-id keeper of its content-fingerprint group;
    * rates are integer ppm. `grouping_id` disambiguates rollup
    * subtotal rows from genuine NULL dimension values.
    *
    * Scale shape: one fingerprint pass collapses the corpus to
    * (fingerprint × dims) CELLS — so the scraper-loop hot key this
    * report exists to catch (one fingerprint, millions of copies)
    * reduces map-side to a count, and NO raw-row join ever routes the
    * hot group through one reducer. The keeper's cell is resolved on
    * the collapsed table (min-id cell per fingerprint), its count
    * decremented by one, and a single ROLLUP (one Expand shuffle)
    * produces every subtotal level.
    */
  def dedupReport(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      dims: Seq[String] = Seq("source", "lang")
  ): DataFrame = {
    // corpus -> one row per (fingerprint, dims) cell; null fps group
    // together via groupBy semantics (the null-safe equality the join
    // formulation needed <=> for)
    val cells = docs
      .withColumn(GroupKey, TextOps.fingerprint(col(textCol)))
      .groupBy(col(GroupKey) +: dims.map(col): _*)
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__min_id"))
      .localCheckpoint(false) // two consumers: keeper agg + the join back
    val keeper = cells.groupBy(GroupKey)
      .agg(min(col("__min_id")).as("__keep"))
      .withColumnRenamed(GroupKey, "__kfp")
    // null-safe join: the NULL-fingerprint (null-text) cell group must
    // meet its keeper too — a plain equi-join silently drops it
    val withKeeper = cells.join(keeper, col(GroupKey) <=> col("__kfp"))
      .withColumn("__dups",
        col("__n") - when(col("__min_id") === col("__keep"), 1L).otherwise(0L))
    withKeeper.rollup(dims.map(col): _*)
      .agg(grouping_id().as("gid"),
        sum(col("__n")).as("n_docs"),
        sum(col("__dups")).as("n_dups"))
      .withColumn("dup_ppm", expr("CAST((n_dups * 1000000) DIV n_docs AS BIGINT)"))
  }

  /** Truncation-duplicate groups: documents sharing an IDENTICAL
    * `kPrefix`-token prefix — the "same article cut at different
    * lengths" stratum (RSS truncation, paywall cuts, re-syndication)
    * that exact dedup misses (different full-text hashes) and MinHash
    * only probabilistically resolves. Only docs with ≥ `kPrefix` tokens
    * participate; groups of ≥ 2 are returned, one row per member, with
    * the LONGEST member (ties → min id) as `canonical_id` — keep the
    * canonical, drop or flag the truncations.
    *
    * Scale shape: one prefix-fingerprint projection (16-byte shuffle
    * key), one skew-safe `groupBy(fp).agg(max(struct))` canonical pick
    * (no window — the same argmax-by-struct shape as
    * [[keepBestPerCluster]]), one join back. A viral identical prefix
    * (site boilerplate header) produces a big GROUP but never a big
    * ROW — membership stays row-shaped, unlike collect_list buckets.
    */
  def truncationDupGroups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      kPrefix: Int = 32
  ): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val base = docs
      .select(col(idCol).as("id"), size(toks).cast("long").as("n_tokens"),
        TextOps.fingerprint(concat_ws(" ", slice(toks, 1, kPrefix))).as("fp"))
      .filter(col("n_tokens") >= kPrefix)
    val canon = base.groupBy("fp")
      .agg(max(struct(col("n_tokens"), (-col("id")).as("__negid"))).as("w"),
        count(lit(1)).as("__n_group"))
      .filter(col("__n_group") >= 2)
      .select(col("fp"), (-col("w.__negid")).as("canonical_id"),
        col("w.n_tokens").as("canonical_n_tokens"))
    base.join(canon, Seq("fp"))
      .select(col("id"), col("n_tokens"), col("canonical_id"),
        col("canonical_n_tokens"))
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature rows `(id, j, mh)` — row-shaped variant of
    * [[minhashSignatureArray]] (same hash family, same values). One
    * explode + one (id, j) shuffle; linear in corpus size.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      shingleN: Int = 3
  ): DataFrame = {
    val (as, bs) = Hashing.minhashParams(numHashes)
    val (aLit, bLit) = (typedlit(as), typedlit(bs))
    docs.select(col(idCol).as("id"),
        explode(TextOps.shingleSet(col(textCol), shingleN)).as("sh"))
      .select(col("id"), Hashing.md5Hash32(0, col("sh")).as("h0"))
      .select(col("id"), explode(sequence(lit(0), lit(numHashes - 1))).as("j"), col("h0"))
      .groupBy("id", "j")
      .agg(min((element_at(aLit, col("j") + 1) * col("h0") + element_at(bLit, col("j") + 1))
        % lit(Hashing.MinhashPrime)).as("mh"))
  }

  /** LSH band keys `(id, band, bkey)` — signature values of each band
    * concatenated in hash order.
    */
  def lshBandKeys(signatures: DataFrame, rowsPerBand: Int = 4): DataFrame =
    signatures
      .withColumn("band", (col("j") / rowsPerBand).cast("int"))
      .groupBy("id", "band")
      .agg(concat_ws(",",
        transform(sort_array(collect_list(struct(col("j"), col("mh")))),
          s => s.getField("mh").cast("string"))).as("bkey"))

  /** Whole MinHash signature as one array column — no shuffle (the
    * row-per-(id,j) variant shuffles docs×shingles×numHashes rows; this
    * shuffles nothing). Hash family: ONE md5 base hash per shingle, then
    * numHashes affine transforms (a_j·h+b_j) mod p — higher-order-function
    * lambdas are interpreted, so the md5 count, not the arithmetic, is
    * what matters.
    */
  def minhashSignatureArray(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      shingleN: Int = 3
  ): DataFrame = {
    val (as, bs) = Hashing.minhashParams(numHashes)
    // Fused single-pass signature expression — one JVM loop per row. The
    // lambda formulation it replaces (aggregate-fold of affine transforms
    // over the md5 array) is bit-identical but evaluates interpreted:
    // higher-order functions never reach whole-stage codegen, and its
    // numHashes×shingles interpreted steps dominated the signature scan.
    //
    // The empty-doc pre-filter tests the TOKEN count, not the shingle
    // array: `size(tokens) >= n ⟺ shingle set non-empty` (same rows,
    // single-space split both sides), and predicate pushdown substitutes
    // project aliases into the filter — a `size(shingle_set(text)) > 0`
    // formulation built the whole shingle array TWICE per row (once in
    // the pushed-down predicate, once for the signature).
    import org.apache.spark.sql.graftbridge.ColumnBridge
    docs.filter(size(TextOps.tokens(col(textCol))) >= shingleN)
      .select(col(idCol).as("id"), TextOps.shingleSet(col(textCol), shingleN).as("shs"))
      .select(col("id"),
        ColumnBridge.column(graft.functions.MinhashSigExpr(
          ColumnBridge.expression(col("shs")), 0, as, bs)).as("sig"))
  }

  /** THE banding scheme, shared by every LSH consumer ([[minhashPairs]],
    * [[lshBandStats]], streaming `StatefulOps.nearDupHits`): from a frame
    * holding a `sig` MinHash-signature array, one row per (row, band)
    * with the band's signature slice as a comma-joined `bkey`, all other
    * input columns carried through. Centralized so the batch dedup, its
    * diagnostics, and the streaming detector can never silently diverge
    * on key formatting or slice offsets.
    */
  private[graft] def bandKeys(withSig: DataFrame, numHashes: Int,
                              rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"rowsPerBand ($rowsPerBand) must divide numHashes ($numHashes) — " +
        "a remainder would silently drop signature rows from banding")
    withSig
      .withColumn("band",
        explode(sequence(lit(0), lit(numHashes / rowsPerBand - 1))))
      .withColumn("bkey", concat_ws(",",
        transform(sequence(lit(0), lit(rowsPerBand - 1)),
          r => element_at(col("sig"), col("band") * rowsPerBand + r + 1).cast("string"))))
      .drop("sig")
  }

  /** Candidate near-dup pairs: docs sharing at least one full LSH band.
    * Equi-join on (band, bkey) — shuffle-scalable, no cross product.
    *
    * `maxBucketSize` (standard LSH practice) bounds the pair explosion
    * on degenerate buckets: with r=4 bands, buckets hold near-identical
    * docs — which is exactly the boilerplate failure mode, where 10⁷
    * template pages land in ONE bucket and emit k² pairs. A finite cap
    * switches the bucket aggregate to a bounded collector ([[CappedIds]]:
    * per-bucket buffer never exceeds cap+1 ids, so the hot bucket never
    * materializes its member array either) and DROPS buckets with more
    * than `maxBucketSize` members. Dropped buckets are observable before
    * running this operator via [[lshBandStats]]' `n_dropped_*` columns
    * with the same cap. Docs in an oversized bucket usually share other,
    * less degenerate bands, and boilerplate that floods a bucket is
    * better handled by [[exactDedup]]/[[TextOps]] boilerplate pruning
    * first — dropping is the standard trade. The default (Int.MaxValue)
    * keeps the uncapped single-aggregate plan bit-identical.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3,
      maxBucketSize: Int = Int.MaxValue
  ): DataFrame = {
    bucketPairs(bandKeys(
      minhashSignatureArray(docs, idCol, textCol, numHashes, shingleN),
      numHashes, rowsPerBand), maxBucketSize)
  }

  /** The in-bucket pair emission shared by [[minhashPairs]] and
    * [[minhashPairsFromSets]]: group per (band, bkey) bucket and emit
    * the member combinations — ONE pass over the signature pipeline (a
    * self-join would compute it twice), with the capped collector
    * bounding degenerate buckets when `maxBucketSize` is finite.
    */
  private def bucketPairs(bands: DataFrame, maxBucketSize: Int): DataFrame = {
    val buckets =
      if (maxBucketSize == Int.MaxValue)
        bands.groupBy("band", "bkey")
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) > 1)
      else {
        val bounded = udaf(new BoundedIdCollect(maxBucketSize))
        bands.groupBy("band", "bkey")
          .agg(bounded(col("id")).as("c"))
          // k is the TRUE bucket size even though the buffer is truncated
          .filter(col("c.k") > 1 && col("c.k") <= maxBucketSize)
          .select(sort_array(col("c.ids")).as("ids"))
      }
    explodePairs(buckets).distinct()
  }

  /** [[minhashPairs]] from pre-built [[shingleHashSets]]: the MinHash
    * signature is derived from the stored base hashes
    * ([[graft.functions.MinhashSigFromHashesExpr]] — bit-identical to
    * the from-text signature because min over affine images is
    * invariant to the dedup/sort the sets table applied, and the
    * `n > 0` row filter equals [[minhashSignatureArray]]'s
    * `size(tokens) ≥ shingleN` pre-filter), so [[blockingEval]]'s
    * candidate leg re-reads the one materialized gram table instead of
    * re-tokenizing the corpus.
    */
  private[graft] def minhashPairsFromSets(
      sets: DataFrame,
      numHashes: Int,
      rowsPerBand: Int,
      maxBucketSize: Int = Int.MaxValue
  ): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val (as, bs) = Hashing.minhashParams(numHashes)
    val withSig = sets.select(col("id"),
      ColumnBridge.column(graft.functions.MinhashSigFromHashesExpr(
        ColumnBridge.expression(col("hs")), as, bs)).as("sig"))
    bucketPairs(bandKeys(withSig, numHashes, rowsPerBand), maxBucketSize)
  }

  /** Bounded bucket accumulator for [[minhashPairs]]' capped path: exact
    * member count `k` plus at most cap+1 collected ids — enough to decide
    * `k <= cap` (in which case no truncation occurred and `ids` is the
    * complete bucket) while a degenerate hot bucket costs O(cap) memory
    * in the aggregation buffer instead of O(k).
    */
  private[graft] case class CappedIds(k: Long, ids: Seq[Long])

  private[graft] class BoundedIdCollect(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, CappedIds, CappedIds] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: CappedIds = CappedIds(0L, Vector.empty)
    override def reduce(b: CappedIds, id: Long): CappedIds =
      CappedIds(b.k + 1, if (b.ids.length <= cap) b.ids :+ id else b.ids)
    override def merge(a: CappedIds, b: CappedIds): CappedIds =
      CappedIds(a.k + b.k, (a.ids ++ b.ids).take(cap + 1))
    override def finish(r: CappedIds): CappedIds = r
    override def bufferEncoder: Encoder[CappedIds] = Encoders.product[CappedIds]
    override def outputEncoder: Encoder[CappedIds] = Encoders.product[CappedIds]
  }

  /** Two-sided [[BoundedIdCollect]]: one aggregation pass collects BOTH
    * corpora's ids per signature (`isA` tags the side), so a cross-corpus
    * blocking join ([[linkPairs]]) needs ONE shuffle over the union
    * instead of one aggregate per side plus a sig join. `ka`/`kb` count
    * per-side EMISSIONS (the cap contract); id vectors stop growing at
    * cap+1 so an over-cap signature carries bounded state.
    */
  private[graft] case class CappedSides(ka: Long, a: Seq[Long], kb: Long, b: Seq[Long])

  private[graft] class BoundedSideCollect(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Boolean, Long), CappedSides, CappedSides] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: CappedSides = CappedSides(0L, Vector.empty, 0L, Vector.empty)
    override def reduce(s: CappedSides, in: (Boolean, Long)): CappedSides =
      if (in._1)
        CappedSides(s.ka + 1, if (s.a.length <= cap) s.a :+ in._2 else s.a, s.kb, s.b)
      else
        CappedSides(s.ka, s.a, s.kb + 1, if (s.b.length <= cap) s.b :+ in._2 else s.b)
    override def merge(x: CappedSides, y: CappedSides): CappedSides =
      CappedSides(x.ka + y.ka, (x.a ++ y.a).take(cap + 1),
        x.kb + y.kb, (x.b ++ y.b).take(cap + 1))
    override def finish(r: CappedSides): CappedSides = r
    override def bufferEncoder: Encoder[CappedSides] = Encoders.product[CappedSides]
    override def outputEncoder: Encoder[CappedSides] = Encoders.product[CappedSides]
  }

  /** LSH tuning diagnostics: per band, the bucket count, how many buckets
    * collide (≥2 docs), and the candidate-pair volume Σ k·(k−1)/2 those
    * buckets emit. This is the observability an operator needs BEFORE
    * running [[minhashPairs]] at scale — a hot bucket here is the skew
    * that would blow up the pair explosion. Same signature pipeline as
    * minhashPairs plus one (band,bkey) aggregate; never materializes the
    * pairs themselves.
    *
    * `maxBucketSize` mirrors [[minhashPairs]]' cap: `n_dropped_buckets` /
    * `n_dropped_pairs` report, per band, how many buckets (and how much
    * of the candidate-pair volume) THAT cap would discard — run this with
    * the production cap to see what the capped pair pass will skip. The
    * first four columns always describe the UNCAPPED totals, so the
    * diagnostic itself is cap-independent.
    */
  def lshBandStats(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3,
      maxBucketSize: Int = Int.MaxValue
  ): DataFrame =
    bandKeys(minhashSignatureArray(docs, idCol, textCol, numHashes, shingleN),
        numHashes, rowsPerBand)
      .groupBy("band", "bkey")
      .agg(count(lit(1)).as("k"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_buckets"),
        count_if(col("k") > 1).as("n_colliding"),
        sum(expr("k * (k - 1) div 2")).as("n_candidate_pairs"),
        count_if(col("k") > maxBucketSize).as("n_dropped_buckets"),
        coalesce(sum(when(col("k") > maxBucketSize,
          expr("k * (k - 1) div 2"))), lit(0L)).as("n_dropped_pairs"))

  // -------------------------------------------------------------- jaccard

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    * Token-join (shuffle on shingle) — exact verifier for MinHash; at
    * 100 TB prefer [[minhashPairs]] (frequent shingles make this join
    * super-linear).
    *
    * `maxBucketSize` is the verifier-path analog of [[minhashPairs]]'
    * cap: a shingle present in more than `maxBucketSize` documents (a
    * boilerplate trigram — the exact shape that makes this join
    * super-linear) is DROPPED instead of materializing one giant
    * `collect_list` row and k² intersection increments. The semantics
    * differ from the LSH cap, and deliberately so: dropping a bucket
    * here removes that shingle from the INTERSECTION counts while the
    * per-doc set sizes keep counting it, so the reported Jaccard is a
    * lower bound for pairs sharing an ultra-common shingle — the
    * standard document-frequency cap used by exact-verification passes
    * (common shingles carry no near-dup signal anyway). Pairs whose
    * every shared shingle is dropped vanish entirely; with the bounded
    * collector ([[BoundedIdCollect]]) the hot bucket's aggregation
    * buffer is O(cap), not O(k). The DEFAULT is the finite
    * [[DefaultShingleBucketCap]] — at corpus scale one viral
    * boilerplate trigram under an ∞ default is a quadratic pair bomb,
    * so uncapped is the opt-in (pass `Int.MaxValue` for verifier runs
    * that must see every pair), not the default. The q35/q189 oracles
    * inline the same document-frequency exclusion, so the drop
    * criterion itself is value-gated.
    */
  /** Shared candidate + intersection machinery for [[jaccardPairs]] /
    * [[containmentPairs]]: exact shingle-set intersection counts for
    * every document pair sharing ≥1 shingle, with per-doc set sizes
    * attached. Set sizes come from a plain projection (no explode/
    * shuffle); intersection counts from ONE explode → bucket-combos
    * pass (the textbook shingle self-join would scan and shuffle the
    * corpus twice). Buckets are keyed on the codegen'd 32-bit shingle
    * hash, not the shingle string: the shuffle moves 8-byte longs
    * instead of ~30-byte strings and the hash-aggregate compares
    * primitives. A hash collision merges two buckets (probability
    * < 2^-32 per distinct-shingle pair, deterministic, and the oracle
    * hashes identically); the id_a != id_b guard drops the self-pairs
    * a within-document collision would emit.
    */
  private def shingleIntersections(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      maxBucketSize: Int
  ): DataFrame = {
    val shingleArr = TextOps.shingleSet(col(textCol), shingleN)
    // NOTE (r19): a one-pass variant that rode the set size through the
    // bucket structs (no sizes table, no size joins — the
    // [[jaccardPairsPrefixFromSets]] idiom) was built, measured
    // locally neutral, and REVERTED on the deep scaling sweep: n riding
    // every pair row pushed the heaviest shuffle's bytes up and read
    // q35's ×16→×64 exponent at 1.26 (was 1.00). The sizes table is
    // doc-grain and its joins attach n AFTER the pair aggregate — the
    // correct side of the pair/doc volume asymmetry at scale.
    val sizes = docs.select(col(idCol).as("id"), size(shingleArr).as("n"))
      .filter(col("n") > 0)
    val hashed = docs.select(col(idCol).as("id"), explode(shingleArr).as("sh"))
      .select(col("id"), Hashing.md5Hash32(0, col("sh")).as("h"))
    val buckets =
      if (maxBucketSize == Int.MaxValue)
        hashed.groupBy("h")
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) > 1)
      else {
        val bounded = udaf(new BoundedIdCollect(maxBucketSize))
        hashed.groupBy("h")
          .agg(bounded(col("id")).as("c"))
          // k is the TRUE document frequency even though the buffer is
          // truncated at cap+1 — the filter decides drop-vs-keep exactly
          .filter(col("c.k") > 1 && col("c.k") <= maxBucketSize)
          .select(sort_array(col("c.ids")).as("ids"))
      }
    explodePairs(buckets)
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
  }

  def jaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBucketSize: Int = DefaultShingleBucketCap
  ): DataFrame = {
    shingleIntersections(docs, idCol, textCol, shingleN, maxBucketSize)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      // ppm via integer floor-division: Jaccard values are small-
      // denominator rationals, which sit exactly on round() boundaries
      // where engines' rounding modes disagree — integer division is
      // bit-exact everywhere
      .select(col("id_a"), col("id_b"),
        floor(col("inter") * 1000000L / (col("na") + col("nb") - col("inter")))
          .cast("long").as("jaccard_ppm"))
  }

  /** Containment (asymmetric) near-dup pairs — `inter / min(|A|, |B|)`
    * instead of Jaccard's union denominator: the QUOTATION detector.
    * A short document embedded whole inside a long one (a quoted
    * article, a syndicated paragraph, a doc + boilerplate wrapper) has
    * tiny Jaccard — the union is dominated by the long side — but
    * containment 1.0; [[jaccardPairs]] structurally cannot flag it at
    * any sane threshold. Same candidate machinery, same bucket cap,
    * same integer-ppm verdict; output additionally carries both set
    * sizes so the KEEP policy can choose the superset side.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      threshold: Double = 0.8,
      maxBucketSize: Int = DefaultShingleBucketCap
  ): DataFrame = {
    shingleIntersections(docs, idCol, textCol, shingleN, maxBucketSize)
      .withColumn("containment",
        col("inter").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("na"), col("nb"),
        floor(col("inter") * 1000000L / least(col("na"), col("nb")))
          .cast("long").as("containment_ppm"))
  }

  /** Prefix-filtered exact set-similarity join (the PPJoin family's
    * prefix filter, Chaudhuri/Xiao et al.) — EXACT Jaccard pairs at
    * threshold `thresholdTenths/10` with a candidate stage that is
    * provably complete yet touches only each document's RAREST
    * shingles.
    *
    * The filter: order every shingle hash by the global total order
    * (document frequency ascending, hash ascending) and keep each
    * document's first `|s| − ⌈t·|s|⌉ + 1` shingles as its PREFIX. Two
    * sets with `J ≥ t` overlap in more than `|A∪B| − ⌈t·|A∪B|⌉`
    * elements, so under ANY common total order their prefixes must
    * intersect — sharing only post-prefix (frequent) shingles caps the
    * overlap below the threshold. Candidates therefore come from
    * prefix-shingle buckets alone: the viral boilerplate shingle that
    * makes the plain bucket join quadratic sits at the END of the
    * order and lands in a prefix only for documents with almost no
    * rare shingles. `DedupSpec` pins equality with the brute-force
    * join across thresholds AND the candidate-count reduction.
    *
    * Everything is integer-exact: the threshold test is the
    * division-cleared `inter·10 ≥ t₁₀·(nA+nB−inter)` and sizes/
    * intersections are counted over the 32-bit shingle hashes (a
    * cross-doc hash collision merges two shingles for df/verify alike;
    * the oracle hashes identically, q35's convention).
    *
    * 100 TB shape: one shuffle for df (shingle-grain aggregate), one
    * doc-partitioned window for the prefix ranks, a bucket join over
    * prefix shingles only, and a verify join that moves each CANDIDATE
    * document's hash array once. No all-pairs stage anywhere; the
    * verify stays exact because the full hash sets (not the prefixes)
    * drive the intersection.
    */
  def jaccardPairsPrefix(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      thresholdTenths: Int = 7
  ): DataFrame = {
    require(thresholdTenths >= 1 && thresholdTenths <= 10,
      s"thresholdTenths must be in [1,10], got $thresholdTenths")
    val t = thresholdTenths
    val sets = shingleHashSets(docs, idCol, textCol, shingleN)
    jaccardPairsPrefixFromSets(sets, t)
  }

  /** The sorted-distinct shingle-hash sets `(id, hs, n)` — ONE
    * tokenize→shingle→hash→sort pass over the corpus, lazily
    * localCheckpointed because its consumers branch several ways (the
    * shingle explode, the prefix-rank join, both verify sides of
    * [[jaccardPairsPrefixFromSets]], and in [[blockingEval]] also the
    * MinHash signature leg and the doc count). The materialized frame
    * is one row per doc with its sorted hash array (the same volume
    * class as the shuffles around it); at cluster scale swap for
    * persist(DISK_ONLY) if executor-loss recovery matters. Docs with an
    * empty shingle set are excluded (`n > 0` ⟺ `size(tokens) ≥ n`,
    * the same row set every shingle-family operator keeps).
    */
  private[graft] def shingleHashSets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int
  ): DataFrame =
    docs
      .select(col(idCol).as("id"),
        array_sort(array_distinct(transform(
          TextOps.shingleSet(col(textCol), shingleN),
          s => Hashing.md5Hash32(0, s)))).as("hs"))
      .withColumn("n", size(col("hs")))
      .filter(col("n") > 0)
      .localCheckpoint(false)

  /** [[jaccardPairsPrefix]] from pre-built [[shingleHashSets]] — split
    * out so [[blockingEval]] can feed its truth leg the SAME sets table
    * its candidate leg and doc count read.
    */
  private[graft] def jaccardPairsPrefixFromSets(
      sets: DataFrame,
      thresholdTenths: Int
  ): DataFrame = {
    require(thresholdTenths >= 1 && thresholdTenths <= 10,
      s"thresholdTenths must be in [1,10], got $thresholdTenths")
    val t = thresholdTenths
    // `n` rides the explode (8 bytes per shingle row) so the prefix
    // filter needs no join back onto `sets`
    val sh = sets.select(col("id"), col("n"), explode(col("hs")).as("h"))
    val df = sh.groupBy("h").agg(count(lit(1)).as("d"))
    val ranked = sh.join(df, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d"), col("h"))))
    val prefix = ranked
      // prefix length n − ⌈t·n/10⌉ + 1, ceil division in integers
      .filter(col("rk") <= col("n") - expr(s"($t * n + 9) DIV 10") + lit(1))
      .select(col("id"), col("n"), col("h"), col("rk"))
    // size early-exit (the PPJoin length filter): J ≥ t implies
    // t·max(|A|,|B|) ≤ 10·min(|A|,|B|). The set size rides the bucket
    // structs so the filter runs on the RAW in-bucket pairs, BEFORE the
    // pair distinct and before any hash-array join — at sf0.1 it kills
    // ~48% of candidate pairs on two ints, halving the rows the
    // distinct shuffles and the verify joins move arrays for. Purely a
    // compute skip: any pair failing it also fails the exact threshold,
    // so the emitted pair set is unchanged bit for bit.
    //
    // Positional early-exit (the PPJoin position filter): both docs
    // list their shingles in the SAME global total order (df, then
    // hash), so at a shared shingle with prefix ranks (rka, rkb) the
    // overlap is bounded by min(rka, rkb) common slots at or before it
    // plus min(na−rka, nb−rkb) after it; J ≥ t/10 needs overlap
    // ≥ ⌈t·(na+nb)/(10+t)⌉, i.e. keep iff ub·(10+t) ≥ t·(na+nb).
    // Sound per occurrence: a TRUE pair's every shared slot satisfies
    // ub ≥ inter ≥ the bound, so it still reaches the distinct from
    // all its buckets; a killed occurrence could only have fed the
    // exact verify with a pair that fails it. The ranks are dropped
    // BEFORE the distinct (a pair surviving via two buckets carries
    // two rank pairs — distinct must collapse them).
    val candidates = prefix.groupBy("h")
      .agg(sort_array(collect_list(struct(col("id"), col("n"), col("rk"))))
        .as("ids"))
      .filter(size(col("ids")) > 1)
      .transform(explodePairsWithSize)
      .filter(lit(10L) * least(col("na"), col("nb")) >=
        lit(t.toLong) * greatest(col("na"), col("nb")))
      .filter((least(col("rka"), col("rkb")) +
          least(col("na") - col("rka"), col("nb") - col("rkb"))) *
          lit(10L + t) >=
        lit(t.toLong) * (col("na") + col("nb")))
      .select("id_a", "na", "id_b", "nb")
      .distinct()
    // verify kernel: two-pointer merge count over the sorted hash sets
    // (SortedIntersectSizeExpr) instead of size(array_intersect(...)) —
    // the builtin hashes one side and MATERIALIZES the intersection
    // array per candidate pair just to take its length; the sets are
    // sorted-distinct by construction, so the merge count is the same
    // integer with zero allocation (DedupSpec pins the operator against
    // the brute-force join)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    candidates
      .join(sets.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("inter", ColumnBridge.column(
        graft.functions.SortedIntersectSizeExpr(
          ColumnBridge.expression(col("hs_a")),
          ColumnBridge.expression(col("hs_b")))))
      .filter(col("inter") * lit(10L) >= lit(t.toLong) * (col("na") + col("nb") - col("inter")))
      .select(col("id_a"), col("id_b"),
        floor(col("inter") * lit(1000000L) / (col("na") + col("nb") - col("inter")))
          .cast("long").as("jaccard_ppm"))
  }

  /** Cross-source n-gram overlap matrix — provenance/leakage analysis
    * at the SOURCE level: for every source pair, the number of shared
    * distinct word `shingleN`-gram fingerprints plus integer Jaccard
    * and containment rates. A high-containment pair means one source
    * largely republishes the other (syndication, mirroring, scraped
    * copies) — the corpus-composition signal that per-document dedup
    * (q35/q189) cannot show because it reports pairs, not structure.
    *
    * Scale shape: one explode → (source, gram-hash) DISTINCT (map-side
    * partials collapse within-source repeats), per-source sizes off
    * that table, and the pair counts from gram-hash buckets whose
    * member list is bounded by the SOURCE COUNT (≤ a few hundred),
    * never by document frequency — so no cap is needed: the bucket
    * explosion is #sources², not corpus². The shuffle moves 8-byte
    * hashes, the q35 convention.
    */
  def sourceOverlap(
      docs: DataFrame,
      keyCol: String = "source",
      textCol: String = "text",
      shingleN: Int = 5
  ): DataFrame = {
    val grams = docs.filter(col(textCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("k"),
        explode(TextOps.shingleSet(col(textCol), shingleN)).as("sh"))
      .select(col("k"), Hashing.md5Hash32(0, col("sh")).as("h"))
      .distinct()
    val sizes = grams.groupBy("k").agg(count(lit(1)).as("n"))
    val buckets = grams.groupBy("h")
      .agg(sort_array(collect_set(col("k"))).as("ids"))
      .filter(size(col("ids")) > 1)
    explodePairs(buckets)
      .groupBy(col("id_a").as("s1"), col("id_b").as("s2"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("k").as("s1"), col("n").as("n1")), Seq("s1"))
      .join(sizes.select(col("k").as("s2"), col("n").as("n2")), Seq("s2"))
      .select(col("s1"), col("s2"), col("shared"), col("n1"), col("n2"),
        expr("(shared * 1000000) DIV (n1 + n2 - shared)").as("jaccard_ppm"),
        expr("(shared * 1000000) DIV least(n1, n2)").as("containment_ppm"))
  }

  // ------------------------------------------------------------ edit dist

  /** Edit-distance near-dup pairs — the typo/small-revision family member
    * (one changed word, a fixed date, a corrected spelling) that sits
    * BELOW MinHash's resolution: a one-token change barely moves a
    * 3-shingle set's Jaccard yet is exactly what incremental crawls
    * produce. Candidate blocking is the FastSS deletion neighborhood
    * (Bocek et al., 2007, at token granularity): each document emits its
    * own fingerprint plus one per delete-one-token variant, so two
    * documents within ONE token-level edit (substitution, insertion, or
    * deletion) PROVABLY share a signature — the same pigeonhole
    * guarantee style as [[simhashPairs]]' bands. Multi-token edits
    * surface only when an aligned deletion variant happens to collide;
    * for those run [[minhashPairs]] — the two operators bracket the
    * edit spectrum from one flipped word to wholesale rewrites.
    *
    * Surviving candidates are verified with EXACT character-level
    * `levenshtein` ≤ `maxDist` (`dist` in the output is the char
    * distance), so bucket collisions never escape; `maxDist` only
    * FILTERS — recall is set by the blocking contract above. NULL-text
    * rows are excluded (no edit distance to NULL).
    *
    * Scale shape: tokens+1 signatures per doc (one explode — the same
    * volume class as the shingle ops), one signature shuffle into
    * capped buckets ([[BoundedIdCollect]]) so a viral template cannot
    * emit k² candidates, a pair explode + distinct (identical docs
    * share every signature), and the O(len²) levenshtein verify runs on
    * candidates only — bounded by cap²·buckets, never corpus².
    *
    * COST CONTRACT: each deletion variant copies the document's token
    * pointers minus one, so the signature pass is O(tokens²) PER
    * DOCUMENT (quadratic in doc length — it dominates the measured
    * runtime even on ~20-token fixtures). FastSS is a short-string
    * algorithm: apply this to titles, captions, queries, or pre-chunked
    * lines; for long documents [[minhashPairs]] is the right tool at
    * every edit scale. `maxSigTokens` enforces that contract
    * defensively: a document longer than the cap (default 20 000
    * tokens, far above any short-string workload — a single 10 MB
    * pathological row would otherwise wedge an executor for minutes on
    * ~10¹² pointer copies) is EXCLUDED from blocking entirely, the
    * documented conservative-drop direction (such a doc can only be
    * within `maxDist` character edits of near-identical-length docs
    * anyway, which the same cap also excludes).
    */
  def editDistancePairs(
      docs: DataFrame,
      maxDist: Long = 10L,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucketSize: Int = Int.MaxValue,
      maxSigTokens: Int = 20000
  ): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("txt"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) <= maxSigTokens)
    // explode-then-build, NOT a transform() lambda building the variant
    // list per row: higher-order functions evaluate their lambda
    // INTERPRETED (md5 + slices + concat per position, measured 4.7 s →
    // 1.1 s at sf0.1), while the generator + per-row CASE stays in
    // whole-stage codegen. i = 0 is the undeleted document; the
    // token array is a NAMED column (posGramTable's binding boundary).
    // Deliberately NO distinct() here — that would shuffle the dominant
    // tokens+1-per-doc stream a second time; duplicate skeletons (a doc
    // with identical adjacent tokens) just emit duplicate CANDIDATES,
    // deduped at the far cheaper pair level below. Under the cap, `k`
    // therefore counts signature EMISSIONS, not distinct docs — a
    // marginally conservative drop for repeated-token docs.
    // signature = ONE xxhash64 of the variant TOKEN ARRAY (xxhash64
    // chains element hashes, so boundaries are preserved): the slices
    // copy token POINTERS, never building the variant string that the
    // earlier concat_ws formulation allocated + memcpy'd per position.
    // Because tokens = split(text, " ") exactly, two variant token
    // arrays are equal iff the joined variant texts are equal — the
    // blocking equivalence classes are IDENTICAL to text hashing, and
    // the tokens+1-per-doc shuffle still moves an 8-byte long. A single
    // 64-bit hash is enough HERE (unlike posGramTable's 128-bit pair)
    // because every candidate pair is levenshtein-VERIFIED afterwards —
    // on the UNCAPPED path a collision emits a false candidate that the
    // exact filter rejects, costing one distance computation, never a
    // wrong row. (Under a finite maxBucketSize a collision could
    // additionally merge two buckets past the cap and drop that
    // bucket's true pairs — a ~2⁻⁶⁴-probability conservative drop, same
    // failure direction as the cap itself.) The ORACLE groups on its
    // own md5 of the same variant texts and its candidate set differs
    // at most by collision-only candidates, which the shared verify
    // predicate removes from both sides.
    val sigs = base
      .select(col("id"), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")))).as("i"))
      .select(col("id"),
        xxhash64(lit(1),
          when(col("i") === 0, col("__toks"))
            .otherwise(
              concat(slice(col("__toks"), lit(1), col("i") - 1),
                slice(col("__toks"), col("i") + 1, size(col("__toks"))))))
          .as("sig"))
    val buckets =
      if (maxBucketSize == Int.MaxValue)
        sigs.groupBy("sig")
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) > 1)
      else {
        val bounded = udaf(new BoundedIdCollect(maxBucketSize))
        sigs.groupBy("sig")
          .agg(bounded(col("id")).as("c"))
          .filter(col("c.k") > 1 && col("c.k") <= maxBucketSize)
          .select(sort_array(col("c.ids")).as("ids"))
      }
    explodePairs(buckets)
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
      .join(base.select(col("id").as("id_a"), col("txt").as("ta")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("txt").as("tb")), Seq("id_b"))
      // length pre-filter + trim-and-band verify: edit distance ≥
      // |len Δ| drops incompatible candidates before any DP, and
      // [[graft.functions.BoundedLevenshteinExpr]] trims the common
      // prefix/suffix (near-dup pairs share almost everything, so the
      // DP runs over the few differing characters) then runs the
      // Ukkonen band — EXACT distance for every surviving pair, −1
      // above the bound, so output is hash-identical to the full-DP
      // `levenshtein ≤ maxDist` verify.
      .filter(abs(length(col("ta")) - length(col("tb"))) <= maxDist)
      .withColumn("dist",
        graft.functions.BoundedLevenshteinExpr
          .boundedLevenshtein(col("ta"), col("tb"), maxDist.toInt).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Cross-corpus record LINKAGE — [[editDistancePairs]]' FastSS
    * blocking between TWO tables (entity resolution: re-crawl vs
    * baseline, vendor feed vs catalog, A/B snapshot reconciliation):
    * emit `(id_a, id_b, dist)` for every A-row/B-row pair within
    * `maxDist` character edits, never comparing within a side. Same
    * recall contract as the single-table operator: pairs within ONE
    * token-level edit provably share a deletion signature; the exact
    * `levenshtein ≤ maxDist` verify keeps collisions out.
    *
    * Scale shape: tokens+1 signatures per row per side computed ONCE
    * per side, aggregated into per-sig capped id buckets
    * ([[BoundedIdCollect]] — finite cap BY DEFAULT, the q101/q35
    * convention; a boilerplate template on both sides would otherwise
    * explode capA·capB candidates per signature), a sig-keyed bucket
    * join A×B moving one bounded id-array per signature, pair distinct,
    * then a length pre-filter (dist ≤ d ⇒ |lenΔ| ≤ d) and the BANDED
    * O(len·maxDist) levenshtein verify on surviving candidates only.
    * Caps count signature EMISSIONS (editDistancePairs' documented
    * conservative-drop direction).
    */
  def linkPairs(
      dfA: DataFrame,
      dfB: DataFrame,
      maxDist: Long = 10L,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucketSize: Int = 1000,
      maxSigTokens: Int = 20000
  ): DataFrame = {
    // maxSigTokens: editDistancePairs' short-string cost contract,
    // enforced per side (conservative drop for pathological rows)
    def prep(df: DataFrame) = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("txt"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) <= maxSigTokens)
    // same explode-then-slice token-array signature pipeline as
    // editDistancePairs (see the cost/collision contract there)
    def sigs(base: DataFrame) = base
      .select(col("id"), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")))).as("i"))
      .select(col("id"),
        xxhash64(lit(1),
          when(col("i") === 0, col("__toks"))
            .otherwise(
              concat(slice(col("__toks"), lit(1), col("i") - 1),
                slice(col("__toks"), col("i") + 1, size(col("__toks"))))))
          .as("sig"))
    // bucket BOTH corpora in ONE aggregation pass: the union of
    // side-tagged signatures shuffles once into [[BoundedSideCollect]]
    // buckets (per-side bounded id vectors + per-side emission counts),
    // replacing the earlier shape of one count+semi-join cap PER SIDE
    // plus a sig equi-join — each of which re-derived its signature
    // pipeline. Candidate set is unchanged: pairs sharing a sig where
    // BOTH sides' emission count is in [1, maxBucketSize].
    val baseA = prep(dfA)
    val baseB = prep(dfB)
    val sides = udaf(new BoundedSideCollect(maxBucketSize))
    val tagged = sigs(baseA).select(lit(true).as("__isa"), col("id"), col("sig"))
      .unionByName(sigs(baseB).select(lit(false).as("__isa"), col("id"), col("sig")))
    tagged.groupBy("sig")
      .agg(sides(col("__isa"), col("id")).as("c"))
      .filter(col("c.ka") >= 1 && col("c.kb") >= 1 &&
        col("c.ka") <= maxBucketSize.toLong && col("c.kb") <= maxBucketSize.toLong)
      .select(explode(col("c.a")).as("id_a"), col("c.b").as("__ib"))
      .select(col("id_a"), explode(col("__ib")).as("id_b"))
      .distinct()
      .join(baseA.select(col("id").as("id_a"), col("txt").as("ta")), Seq("id_a"))
      .join(baseB.select(col("id").as("id_b"), col("txt").as("tb")), Seq("id_b"))
      // length pre-filter + trim-and-band exact verify — the
      // editDistancePairs contract ([[graft.functions.BoundedLevenshteinExpr]])
      .filter(abs(length(col("ta")) - length(col("tb"))) <= maxDist)
      .withColumn("dist",
        graft.functions.BoundedLevenshteinExpr
          .boundedLevenshtein(col("ta"), col("tb"), maxDist.toInt).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  // -------------------------------------------------------------- simhash

  /** 32-bit SimHash per document: bit i is the sign of Σ_tokens (±1 per
    * token's hash bit i). Explode ×32 + one (id, bit) shuffle.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .select(col("id"), col("tok"), explode(sequence(lit(0), lit(31))).as("i"))
      .withColumn("b",
        (call_function("shiftright", Hashing.md5Hash32(0, col("tok")), col("i")) % 2) * 2 - 1)
      .groupBy("id", "i")
      .agg(sum(col("b")).as("s"))
      .groupBy("id")
      .agg(sum(when(col("s") > 0, call_function("shiftleft", lit(1L), col("i")))
        .otherwise(lit(0L))).as("simhash"))

  /** 64-bit SimHash per document: bit i is the sign of Σ_tokens (±1 per
    * token's hash bit i). Bits 0–31 come from the seed-0 md5 half, bits
    * 32–63 from an independent seed-1 half — the same oracle-checkable
    * 32-bit primitive twice rather than an unsigned-64 parse (which
    * overflows a signed BIGINT on both engines). Bit 63 makes the
    * fingerprint negative for half of all documents; every consumer masks
    * after shifting instead of using `%`, so band keys stay in [0, 2¹⁶).
    */
  def simhash64(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .select(col("id"), col("tok"), explode(sequence(lit(0), lit(63))).as("i"))
      .withColumn("b",
        (call_function("shiftright",
          when(col("i") < 32, Hashing.md5Hash32(0, col("tok")))
            .otherwise(Hashing.md5Hash32(1, col("tok"))),
          col("i") % 32) % 2) * 2 - 1)
      .groupBy("id", "i")
      .agg(sum(col("b")).as("s"))
      // distinct powers of two, at most one negative term (bit 63 =
      // Long.MinValue), so the sum stays in range under ANSI arithmetic
      .groupBy("id")
      .agg(sum(when(col("s") > 0, call_function("shiftleft", lit(1L), col("i")))
        .otherwise(lit(0L))).as("simhash64"))

  /** SimHash near-dup pairs: block on 16-bit bands of the 64-BIT
    * fingerprint, then keep pairs with Hamming distance ≤ maxHamming.
    * Never all-pairs.
    *
    * Why 64/16 and not the 32/8 banding [[simhash]] would suggest: 8-bit
    * bands give 256 possible keys per band, so bucket size is ~n/256
    * REGARDLESS of data and the in-bucket join is structurally quadratic —
    * at 10⁹ docs that is ~4M rows per bucket and ~10¹³ comparisons per
    * band. 16-bit bands give 65 536 buckets (~n/65k each, 256× fewer
    * comparisons), and 4×16 preserves the pigeonhole recall guarantee for
    * `maxHamming ≤ 3`: ≤3 differing bits cannot touch all 4 bands, so
    * every qualifying pair still shares an identical band. (With
    * maxHamming > 3 blocking recall is probabilistic — same as before.)
    * `maxBucketSize` additionally drops still-degenerate buckets (all-same
    * boilerplate hashes) before the join, mirroring [[minhashPairs]]'
    * cap; dropped buckets are the capped pair volume an operator can
    * bound a priori.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 3, maxBucketSize: Int = Int.MaxValue): DataFrame =
    hammingBandPairs(
      simhash64(docs, idCol, textCol).select(col("id"), col("simhash64").as("h")),
      maxHamming, maxBucketSize)

  /** Perceptual IMAGE near-dup pairs — [[simhashPairs]]' exact banding
    * over the 64-bit dHash ([[Multimodal.imageDHash]]) instead of the
    * text simhash: decode each payload once, band the fingerprint,
    * join within buckets, keep Hamming ≤ `maxHamming`. Undecodable
    * payloads (NULL hash) are excluded — they have no visual identity
    * to collide on (route them to the corrupt-payload side channel,
    * q74's pattern). Same pigeonhole contract as text: with the 4×16
    * banding, every pair at Hamming ≤ 3 provably shares a band, so at
    * the default threshold blocking loses nothing — which is exactly
    * what lets `q208` oracle-check the output against brute-force
    * all-pairs Hamming.
    */
  def perceptualDupPairs(imgs: DataFrame, idCol: String = "doc_id",
                         payloadCol: String = "payload",
                         maxHamming: Int = 3,
                         maxBucketSize: Int = Int.MaxValue): DataFrame =
    hammingBandPairs(
      imgs.select(col(idCol).as("id"),
          Multimodal.imageDHash(col(payloadCol)).as("h"))
        .filter(col("h").isNotNull),
      maxHamming, maxBucketSize)

  /** Shared Hamming-banding engine of [[simhashPairs]] and
    * [[perceptualDupPairs]]: band a 64-bit fingerprint column `h` (keyed
    * by `id`) into 4×16-bit keys, optionally drop degenerate buckets,
    * self-join within buckets, emit distinct `(id_a, id_b, hamming)`
    * with `hamming ≤ maxHamming`. See [[simhashPairs]] for the 4×16
    * rationale (65k buckets/band + pigeonhole recall for ≤ 3).
    */
  private[graft] def hammingBandPairs(hashed: DataFrame,
                                      maxHamming: Int,
                                      maxBucketSize: Int): DataFrame = {
    // (id, h, band, bkey) is 4 narrow rows per doc; pin it once — the
    // bucket-size pass and both join sides would otherwise each rerun the
    // full fingerprint pipeline (a whole simhash aggregation, or one
    // image decode per payload per reference)
    val banded = hashed
      .select(col("id"), col("h"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey",
        call_function("shiftright", col("h"), col("band") * 16).bitwiseAND(lit(65535L)))
      .localCheckpoint(false)
    val kept =
      if (maxBucketSize == Int.MaxValue) banded
      else banded.join(
        banded.groupBy("band", "bkey").agg(count(lit(1)).as("__k"))
          .filter(col("__k") <= maxBucketSize)
          .select("band", "bkey"),
        Seq("band", "bkey"), "left_semi")
    val a = kept.select(col("band"), col("bkey"), col("id").as("id_a"), col("h").as("h_a"))
    val b = kept.select(col("band"), col("bkey"), col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------ clustering

  /** Connected components over near-dup candidate pairs: every doc gets
    * `cluster_id` = the minimum doc id reachable through pair edges (its
    * own id for singletons). Distributed min-label propagation — each
    * iteration is one join + one aggregate, loop count = graph diameter
    * (tiny for near-dup clusters, which are cliques-ish).
    * `localCheckpoint` cuts lineage between iterations. At extreme scale
    * (or high-diameter dup graphs) swap in [[nearDupClustersLSS]] —
    * large-star/small-star, same primitives, O(log² n) rounds.
    */
  def nearDupClusters(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIterations: Int = 20,
      driverMaxEdges: Long = 1L << 20
  ): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(false)
    // Hybrid strategy: near-dup subgraphs are a small fraction of any
    // corpus (the edges are CANDIDATE DUPLICATES, not the corpus), so up
    // to `driverMaxEdges` the component labels come from a driver-side
    // union-find over the checkpointed edge list — one collect replaces
    // ~3 jobs per propagation round, the same small-side trade a
    // broadcast join makes. Past the threshold (pathological dup volume)
    // the distributed min-label loop below takes over unchanged.
    // Labels are identical either way: min reachable id per component.
    // The 1M-edge default bounds driver heap: the collect materializes
    // ~2M (Long, Long) tuples (tens of MB) — raise it only alongside
    // spark.driver.memory.
    if (edges.count() <= driverMaxEdges) {
      val session = pairs.sparkSession
      import session.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.as[(Long, Long)].collect().foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val labels = parent.keys.map(k => (k, find(k))).toSeq.toDF("id", "cluster_id")
      return docs.select(col(idCol).as("id"))
        .join(broadcast(labels), Seq("id"), "left")
        .select(col("id").as(idCol),
          coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    }
    // Only nodes incident to an edge can ever change label — iterate over
    // the (near-dup subgraph) node set, not the whole corpus. At 100 TB
    // the corpus is billions of docs but the dup subgraph is a small
    // fraction; every iteration's join/agg then scales with dup volume,
    // and the corpus is touched exactly once by the final label join.
    //
    // Seed labels WITH the first hop folded in (min of self and direct
    // neighbors — one aggregate, no join), then each iteration is one
    // join + one union + one min-aggregate: two shuffles, versus three for
    // the textbook join/agg/join-back formulation.
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("label"))
      .localCheckpoint(false)
    // Convergence check: labels only ever decrease under min-propagation,
    // so Σ(label) strictly decreases iff any label changed — one scalar
    // aggregate over the already-checkpointed iterate, instead of a
    // join-old-vs-new + filter + count job.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var changed = true
    var iter = 0
    while (changed && iter < maxIterations) {
      val updated = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
        .union(labels)
        .groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val s = labelSum(updated)
      changed = s.compareTo(prevSum) != 0
      prevSum = s
      labels = updated
      iter += 1
    }
    // labels still moving at the round cap = NOT a fixed point: some
    // component would silently come back split into several clusters.
    // Fail loud — the caller raises maxIterations (round count is the
    // graph diameter) or switches to [[nearDupClustersLSS]].
    if (changed) throw new IllegalStateException(
      s"min-label propagation did not converge in $maxIterations rounds " +
        "(dup-graph diameter exceeds the cap); raise maxIterations or " +
        "use nearDupClustersLSS, whose round count is O(log^2 n)")
    // singletons (no edges) label themselves; the converged sub-labels are
    // tiny and broadcast-join back onto the corpus
    docs.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("label", "cluster_id"), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the documented extreme-scale swap for
    * [[nearDupClusters]]'s min-label loop. Identical output contract:
    * every doc labeled with the minimum id reachable through pair edges,
    * own id for singletons.
    *
    * Why it exists: min-label propagation needs DIAMETER rounds — a
    * pathological chain of near-dup docs (a↔b, b↔c, …) makes the round
    * count linear in chain length. Large-star/small-star converges in
    * O(log² n) rounds worst-case (≈5 in practice) regardless of diameter,
    * with skew-safe per-round primitives: each star step computes the
    * per-node neighborhood minimum as a `groupBy(a).agg(min(b))` (map-side
    * partial combine) joined back onto the edge list — never a window over
    * the node, which would buffer a component-minimum node's ENTIRE
    * neighborhood (at the fixed point, its whole component) in one
    * `WindowExec` task. The join-back costs one extra shuffle per step but
    * streams through sort-merge join and is AQE-skew-splittable, so no
    * single-task ceiling exists on hub nodes.
    *
    *  - large-star: per node u, hook every LARGER neighbor to
    *    m = min(Γ(u) ∪ u) — edges (m, v) for v ∈ Γ(u), v > u;
    *  - small-star: per node u over its SMALLER neighbors, hook them and
    *    u itself to m = min(Γ≤(u) ∪ u);
    *  - fixed point: a forest of stars centered at component minima
    *    (checked exactly with an anti-join, one cheap job per round —
    *    edge sums can collide across different edge sets, so a checksum
    *    shortcut like [[nearDupClusters]]'s Σ(label) is not sound here).
    *
    * Edge volume never grows (every emitted edge replaces one incident
    * edge with a star edge to a smaller node), so each round's shuffle is
    * bounded by the candidate-pair volume — at 100 TB this scales with
    * dup density, not corpus size, and the corpus itself is touched once
    * by the final broadcast label join.
    */
  def nearDupClustersLSS(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIterations: Int = 30
  ): DataFrame = {
    // canonical distinct undirected edges, lo < hi
    var edges = pairs
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint(false)

    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIterations) {
      val next = smallStarStep(largeStarStep(edges)).localCheckpoint(false)
      // exact fixed-point check: equal edge count and no edge outside the
      // previous set (anti-join) — both one small job over star edges
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("lo", "hi"), "left_anti").isEmpty
      edges = next
      iter += 1
    }
    // a non-fixed-point star forest yields WRONG labels (components still
    // split across stars) — never return it silently. O(log² n) rounds is
    // the worst case, so hitting a 30-round cap means something is off;
    // the remedy is raising maxIterations, not trusting partial output.
    if (!converged) throw new IllegalStateException(
      s"large-star/small-star did not reach a fixed point in $maxIterations " +
        "rounds; raise maxIterations (expected O(log^2 n), ~5 in practice)")
    // fixed point = stars centered at component minima: every non-min node
    // appears exactly once as `hi` with its component min as `lo`
    val labels = edges.select(col("hi").as("id"), col("lo").as("cluster_id"))
      .groupBy("id").agg(min(col("cluster_id")).as("cluster_id"))
    docs.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** One LARGE-STAR round over canonical (lo < hi) edges: per node u,
    * hook every LARGER neighbor to m = min(Γ(u) ∪ u).
    *
    * The neighborhood minimum is a partial-aggregating
    * `groupBy(a).agg(min(b))` joined back onto the (pre-filtered) larger
    * neighbors — NOT `min(b).over(Window.partitionBy(a))`, which would
    * buffer a hub node's entire neighborhood in a single task (the exact
    * straggler [[exactDedup]] avoids the same way). Exposed package-private
    * so the spec can pin the no-`WindowExec` plan shape.
    */
  private[graft] def largeStarStep(e: DataFrame): DataFrame = {
    // both orientations: every node sees its full neighborhood
    val nbrs = e.select(col("lo").as("a"), col("hi").as("b"))
      .union(e.select(col("hi").as("a"), col("lo").as("b")))
    // m = min over the full neighborhood AND u itself; `a` is a grouping
    // key, so it is usable inside the aggregate expression
    val mins = nbrs.groupBy("a").agg(least(min(col("b")), col("a")).as("m"))
    nbrs.filter(col("b") > col("a")) // hook only larger neighbors: m <= a < b
      .join(mins, Seq("a"))
      .select(col("m").as("lo"), col("b").as("hi"))
      .distinct()
  }

  /** One SMALL-STAR round: per node u over its SMALLER neighbors, hook
    * them and u itself to m = min(Γ≤(u) ∪ u). Same skew-safe
    * groupBy-min + join-back shape as [[largeStarStep]]; the (m, a) self
    * edge comes straight off the aggregate (one row per node) instead of
    * being emitted per neighbor row and de-duplicated.
    */
  private[graft] def smallStarStep(e: DataFrame): DataFrame = {
    // orient towards the larger endpoint: group a = hi over neighbors b < a
    val oriented = e.select(col("hi").as("a"), col("lo").as("b"))
    // every b is < a here, so min(b) < a is already the hook target
    val mins = oriented.groupBy("a").agg(min(col("b")).as("m"))
    // hook every smaller neighbor except the min itself (m < b), and a
    oriented.join(mins, Seq("a"))
      .filter(col("b") =!= col("m"))
      .select(col("m").as("lo"), col("b").as("hi"))
      .union(mins.select(col("m").as("lo"), col("a").as("hi")))
      .distinct()
  }

  /** Near-dup dedup end to end: keep the canonical (minimum-id) document
    * of every cluster.
    */
  def keepCanonical(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id"
  ): DataFrame = {
    val clusters = nearDupClusters(docs, pairs, idCol)
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol))
    docs.join(clusters, Seq(idCol), "left_semi")
  }

  /** Quality-aware canonical selection: among each near-dup cluster
    * ([[nearDupClusters]] over `pairs`) keep the member MAXIMIZING
    * `score` (ties → lowest id) — the keep-best-copy policy curation
    * pipelines prefer over [[keepCanonical]]'s keep-lowest-id when
    * near-dups differ in quality (boilerplate-stripped vs raw copies of
    * the same page). Use an integer-exact score
    * ([[TextOps.qualityScorePpm]]) for engine-reproducible winners.
    *
    * Scale shape: clustering cost is [[nearDupClusters]]'; the winner
    * pick is one `groupBy(cluster_id)` over an (id, score) projection
    * using a struct max — max(score, -id) gives argmax-with-min-id-ties
    * in a single partial-aggregating shuffle, no window, no skew
    * ceiling — then a semi-join back onto the corpus.
    */
  def keepCanonicalBy(
      docs: DataFrame,
      pairs: DataFrame,
      score: Column,
      idCol: String = "doc_id"
  ): DataFrame = {
    val winners = docs.select(col(idCol), score.as("__score"))
      .join(nearDupClusters(docs, pairs, idCol), Seq(idCol))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("__score"), (-col(idCol)).as("__negid"))).as("w"))
      .select((-col("w.__negid")).as(idCol))
    docs.join(winners, Seq(idCol), "left_semi")
  }

  /** Leakage-safe train/valid/test split: the split tag hashes the
    * near-dup CLUSTER representative ([[nearDupClusters]] label), not the
    * document id, so near-duplicates can never straddle a split boundary
    * — the classic eval-leakage failure of per-document hashing, where a
    * paraphrase of a training document lands in the test set and inflates
    * eval scores. Same tag arithmetic as [[Sampling.splitTag]] (md5
    * basis-point buckets), applied one level up. Output:
    * `(idCol, cluster_id, split)` for every document (singletons are
    * their own cluster and split like a plain hash split).
    *
    * Scale shape: clustering cost is [[nearDupClusters]]' (the dup
    * subgraph, not the corpus); the tag itself is a codegen'd scalar on
    * the label — no extra shuffle beyond the cluster label join.
    */
  def leakSafeSplit(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      trainBp: Int = 9000,
      validBp: Int = 500,
      seed: Int = 2
  ): DataFrame =
    nearDupClusters(docs, pairs, idCol)
      .withColumn("split",
        Sampling.splitTag(col("cluster_id"), trainBp, validBp, seed))

  /** Split-leakage audit: for each split scheme — `naive` (per-document
    * hash tag) vs `cluster` ([[leakSafeSplit]]) — count the candidate
    * near-dup pairs whose endpoints landed in DIFFERENT splits. The
    * cluster row is structurally 0 (both endpoints share a cluster,
    * hence a tag); the naive row measures the leakage a per-document
    * split would ship. One row per scheme:
    * `(scheme, n_pairs, n_leaked, leak_ppm)`.
    *
    * Scale shape: `pairs` (dup-subgraph-sized) is lazily checkpointed
    * and joined twice per scheme against the per-doc assignment — keyed
    * shuffle joins linear in pairs + corpus, then a 1-row aggregate per
    * scheme.
    */
  def splitLeakageAudit(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      trainBp: Int = 9000,
      validBp: Int = 500,
      seed: Int = 2
  ): DataFrame = {
    val p = pairs.localCheckpoint(false)
    val naive = docs.select(col(idCol).as("__id"),
      Sampling.splitTag(col(idCol), trainBp, validBp, seed).as("__split"))
    val clustered = leakSafeSplit(docs, p, idCol, trainBp, validBp, seed)
      .select(col(idCol).as("__id"), col("split").as("__split"))
    def audit(assign: DataFrame, scheme: String): DataFrame =
      p.join(assign.select(col("__id").as("id_a"), col("__split").as("__sa")), Seq("id_a"))
        .join(assign.select(col("__id").as("id_b"), col("__split").as("__sb")), Seq("id_b"))
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("__sa") =!= col("__sb"), 1L)), lit(0L)).as("n_leaked"))
        .select(lit(scheme).as("scheme"), col("n_pairs"), col("n_leaked"),
          when(col("n_pairs") === 0L, 0L)
            .otherwise(expr("n_leaked * 1000000 DIV n_pairs")).as("leak_ppm"))
    audit(clustered, "cluster").unionByName(audit(naive, "naive"))
  }

  // ---------------------------------------------------------- contamination

  /** Benchmark-contamination check: for every corpus document, the number
    * of distinct word n-gram shingles it shares with ANY document of the
    * benchmark (eval-set) corpus — the standard n-gram-overlap
    * decontamination pass run before pretraining.
    *
    * Scale shape: the benchmark side is small by construction (eval sets
    * are thousands of docs), so its distinct shingle set is broadcast; the
    * corpus is one linear scan + broadcast join, and the only shuffle is
    * the per-doc hit count over MATCHED rows (a tiny fraction of the
    * corpus). Docs with fewer than n tokens have no shingles and are
    * absent from the output — mirrored in the oracle.
    */
  def contamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5
  ): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.shingleSet(col(textCol), n)).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    corpus.select(col(idCol).as("id"), explode(TextOps.shingleSet(col(textCol), n)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"), "left")
      .groupBy("id")
      .agg(count(col("__hit")).as("n_hits"))
  }

  /** Token spans of `docs` overlapping the benchmark's n-gram set — the
    * span-granular escalation of [[contamination]]: instead of DROPPING a
    * document that shares n-grams with the eval set, locate the
    * contaminated PASSAGES so [[scrubContamination]] can excise them and
    * keep the rest of the document (the quoted-a-benchmark-question case,
    * where whole-doc dropping throws away good text). Output schema
    * matches [[duplicateSpans]] — `(id, start_tok, end_tok, n_tokens)` —
    * so the same scrub applies.
    *
    * 100 TB shape: eval sets are small by nature, so the benchmark gram
    * fingerprints BROADCAST; the corpus side is one posexplode + a
    * broadcast semi-join + the per-doc (never corpus-wide) island merge.
    * No shuffle touches corpus text.
    */
  def contaminatedSpans(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5
  ): DataFrame = {
    val benchGrams = benchmark
      .select(explode(TextOps.shingleSet(col(textCol), n)).as("gram"))
      .select(xxhash64(lit(1), col("gram")).as("g1"),
        xxhash64(lit(2), col("gram")).as("g2"))
      .distinct()
    val occ = posGramTable(docs, idCol, textCol, n)
      .join(broadcast(benchGrams), Seq("g1", "g2"), "left_semi")
      .select("id", "pos")
    mergeTokenSpans(occ, n)
  }

  /** [[contaminatedSpans]] + [[scrubDuplicateSpans]] in one call: every
    * token range overlapping a benchmark n-gram removed in place, all
    * other text kept verbatim.
    */
  def scrubContamination(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 5
  ): DataFrame =
    scrubDuplicateSpans(docs,
      contaminatedSpans(docs, benchmark, idCol, textCol, n), idCol, textCol)

  // ---------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-dup pairs. The DEFAULT is the 100 TB shape:
    * `numBands` independent random-hyperplane signatures
    * ([[SimSearch.hyperplaneBucket]], seeds `seed..seed+numBands−1`)
    * generate candidate pairs as same-(band, bucket) co-occupants —
    * the MinHash banding scheme transplanted to the embedding space —
    * and every candidate is then verified with the EXACT cosine, so
    * precision is 1 by construction and only recall is traded.
    *
    * Recall contract: a pair at angle θ collides in one band with
    * p = (1 − θ/π)^numPlanes, so overall recall is 1 − (1 − p^1)^B per
    * band-collision — with the defaults (6 planes × 4 bands), a
    * cos ≥ 0.95 pair (θ ≈ 18°) is caught with ≥ 95% probability while
    * expected bucket occupancy stays |corpus| / 2^numPlanes per band.
    * At corpus scale raise `numPlanes` to keep buckets bounded
    * (≈ log₂(n / targetBucketSize)) and `numBands` to hold recall.
    *
    * `exactVerifier = true` opts into the all-pairs O(n²) crossJoin —
    * recall 1 by construction, VERIFIER SCALE ONLY (the ground-truth
    * twin for recall probes, never the corpus path). Norms are computed
    * once per row either way; `dot/(na·nb)` is the same double
    * expression as `dot/(norm(a)·norm(b))` so the two paths agree
    * bit-for-bit on every pair the bucketed path surfaces.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      dim: Int = 64,
      numPlanes: Int = 6,
      numBands: Int = 4,
      seed: Long = 42L,
      exactVerifier: Boolean = false
  ): DataFrame = {
    val withNorm = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.norm(col(vecCol)).as("nrm"))
    val scored =
      if (exactVerifier) {
        val a = withNorm.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
        val b = withNorm.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
        a.crossJoin(b)
          .filter(col("id_a") < col("id_b"))
          .withColumn("cos",
            VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      } else {
        // map-side banded signatures (foldable hyperplane literals, no
        // shuffle to bucket), ONE shuffle on (band, bucket), distinct
        // candidate pairs, then two id-keyed joins to fetch the vectors
        // for the exact verify — cost tracks candidates, never n²
        val bands = (0 until numBands).map(b =>
          SimSearch.hyperplaneBucket(col("v"), dim, numPlanes, seed + b))
        val buckets = withNorm
          .select(col("id"), posexplode(array(bands: _*)).as(Seq("band", "bucket")))
          .groupBy("band", "bucket")
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) > 1)
        explodePairs(buckets)
          .select("id_a", "id_b").distinct()
          .join(withNorm.select(col("id").as("id_a"),
            col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
          .join(withNorm.select(col("id").as("id_b"),
            col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
          .withColumn("cos",
            VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      }
    scored
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  // ------------------------------------------------------------ substring

  /** Cross-document duplicate SPANS — the substring-granular dedup of
    * Lee et al., 2022 ("Deduplicating Training Data Makes Language
    * Models Better"), re-expressed Spark-first: where the paper builds a
    * corpus-wide suffix array (inherently sequential), this finds every
    * word `k`-gram occurring in ≥ `minDocs` distinct documents — one
    * explode + one fingerprint shuffle, the same cost class as the
    * shingle ops — and merges OVERLAPPING duplicated windows per document
    * into maximal spans with a gaps-and-islands window pass.
    *
    * Output `(id, start_tok, end_tok, n_tokens)` with token-index spans
    * (`[start_tok, end_tok)`, 0-based): every token inside a span lies in
    * at least one k-gram shared with another document. Boilerplate
    * headers, license blocks and templated passages surface here even
    * when whole-document near-dup misses them.
    *
    * Scale shape: k-gram explode is ~tokens-per-doc rows per document
    * (linear); the duplicate-gram filter is one hash-agg on the 128-bit
    * gram fingerprint; span assembly windows on `id` — shuffles scale
    * with corpus token count, never quadratic. `minDocs` > 2 turns the
    * operator into a boilerplate detector (spans shared by many docs).
    */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 8,
      minDocs: Int = 2
  ): DataFrame = {
    // the gram table feeds BOTH the duplicate-gram filter and the join
    // probe side — checkpoint it so the explode+fingerprint scan runs
    // once, not once per consumer (measured 2x on the throughput probe).
    // LAZY checkpoint: constructing the frame (plan inspection, a
    // conditionally-skipped scrub) must not launch the gram job; the
    // checkpointed blocks are freed when the plan is GC'd on the driver
    val grams = posGramTable(docs, idCol, textCol, k).localCheckpoint(false)
    val dupGrams = grams.groupBy("g1", "g2")
      .agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("g1", "g2")
    val occ = grams.join(dupGrams, Seq("g1", "g2")).select("id", "pos")
    mergeTokenSpans(occ, k)
  }

  /** Positional gram-fingerprint table: one row per (doc, gram start
    * position) with the gram's fingerprint as TWO salted xxhash64
    * longs `(g1, g2)` — a combined 128-bit key (collision odds ~2⁻¹²⁸-
    * scale, same safety class as md5) that shuffles as 16 bytes of
    * NUMERIC columns. The previous md5-hex STRING key made the two
    * gram shuffles (doc-frequency agg + join-back) the q119 bottleneck:
    * 32-char keys with string comparisons measured 2.6× slower end to
    * end on the 200k-doc profile (37.7 s → 14.4 s).
    *
    * The token array is projected into a NAMED COLUMN first — the
    * binding boundary that keeps the split from re-evaluating under
    * every `element_at` of the gram build (`CollapseProject` won't
    * inline a non-cheap alias referenced more than once; see
    * [[TextOps.shinglesFromTokens]]). That boundary is load-bearing for
    * performance (measured ~5× on the q105 gram scan) — keep it when
    * editing. Shared by [[duplicateSpans]] and [[contaminatedSpans]].
    */
  private def posGramTable(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("id"),
        posexplode(TextOps.shinglesFromTokens(col("__toks"), n)).as(Seq("pos", "gram")))
      .select(col("id"), col("pos"),
        xxhash64(lit(1), col("gram")).as("g1"),
        xxhash64(lit(2), col("gram")).as("g2"))

  /** Gaps-and-islands merge of flagged k-gram start positions into
    * maximal token spans, per doc: `(id, pos)` hits → `(id, start_tok,
    * end_tok, n_tokens)`. The window is per-doc (partitioned on `id`,
    * bounded by doc length — never corpus-wide). Overlap iff
    * pos < prev + k; adjacent-but-disjoint windows stay separate spans
    * (the text crossing the boundary is not itself a flagged k-gram).
    * Shared by [[duplicateSpans]] and [[contaminatedSpans]].
    */
  private def mergeTokenSpans(occ: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    occ.withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") >= col("prev") + k, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("start_tok"), (max(col("pos")) + k).as("end_tok"))
      .select(col("id"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok")).as("n_tokens"))
  }

  /** Remove every [[duplicateSpans]] token range from the text (the
    * aggressive every-copy policy — callers wanting keep-one-copy
    * semantics anti-join a canonical doc choice out of `spans` first).
    * Per-row lambda filtering over the token array — the HOF tax is per
    * row and bounded by doc length; spans per doc arrive as one small
    * broadcast-shaped array column.
    */
  def scrubDuplicateSpans(
      docs: DataFrame,
      spans: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spanArr = spans.groupBy(col("id").as(idCol))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("__spans"))
    val toks = TextOps.tokens(col(textCol))
    val keep = filter(
      zip_with(toks, sequence(lit(0), size(toks) - 1), (t, i) => struct(t.as("t"), i.as("i"))),
      p => !exists(col("__spans"), s =>
        p.getField("i") >= s.getField("start_tok") && p.getField("i") < s.getField("end_tok")))
    docs.join(spanArr, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__spans").isNull, col(textCol))
          .otherwise(concat_ws(" ", transform(keep, p => p.getField("t")))))
      .drop("__spans")
  }

  // ------------------------------------------------------------- semantic

  /** SemDeDup-style semantic near-dup pairs (Abbas et al., 2023:
    * cluster the embedding space, compare only within clusters): assign
    * every vector to its `nprobe` nearest of `nlist` deterministic pivot
    * centroids ([[SimSearch.pivotCentroids]] — broadcast, map-side, no
    * shuffle), then emit pairs with cosine ≥ `threshold` among vectors
    * sharing a pivot. Output `(id_a, id_b, cos)` with `id_a < id_b`,
    * matching [[embeddingNearDupPairs]] — and always a SUBSET of it
    * (same threshold), reaching equality at `nlist = 1`.
    *
    * Scale shape: one broadcast-assign scan + one shuffle on `cent_id` +
    * within-cluster pair scoring — Σ cluster² · d work instead of the
    * exact verifier's n² · d; cluster granularity (`nlist` ∝ corpus/
    * target-cluster-size) bounds both skew and per-cluster cost. Pairs
    * straddling cluster boundaries are missed by construction —
    * `nprobe > 1` trades shuffle volume for boundary recall. At 100 TB
    * replace the hash pivots with trained k-means centroids
    * ([[SimSearch.trainIvfCentroids]]) for tighter clusters; the
    * dataflow is unchanged.
    */
  def semanticDupPairs(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      nlist: Int = 16,
      nprobe: Int = 1,
      seed: Int = 9
  ): DataFrame = {
    val centB = broadcast(SimSearch.pivotCentroids(embeddings, idCol, vecCol, nlist, seed))
    val wAssign = Window.partitionBy(col("id")).orderBy(col("d"), col("cent_id"))
    val assigned = embeddings
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        VectorOps.norm(col(vecCol)).as("nrm"))
      .crossJoin(centB) // broadcast NLJ: corpus × nlist pivots, map-side
      .withColumn("d",
        VectorOps.normSq(col("pv")) - lit(2.0) * VectorOps.dot(col("v"), col("pv")))
      .withColumn("cr", row_number().over(wAssign))
      .filter(col("cr") <= nprobe)
      .select(col("cent_id"), col("id"), col("v"), col("nrm"))
    val a = assigned.select(col("cent_id"), col("id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cent_id"), col("id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      // nprobe > 1 can surface one pair under several shared pivots
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .distinct()
  }

  /** Semantic dedup end to end: keep the canonical (minimum-id) vector of
    * every semantic-duplicate component. Composes [[semanticDupPairs]]
    * with the same keep rule as [[keepCanonical]].
    */
  def semanticDedup(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9,
      nlist: Int = 16,
      nprobe: Int = 1,
      seed: Int = 9
  ): DataFrame = {
    val pairs = semanticDupPairs(embeddings, idCol, vecCol, threshold, nlist, nprobe, seed)
    keepCanonical(embeddings, pairs, idCol)
  }

  /** LSH candidate precision — the dedup-index quality gate (the
    * [[graft.ext.SimSearch.recallAtK]] counterpart for the MinHash
    * side): of [[minhashPairs]]' banded candidates, the share whose
    * EXACT trigram-set Jaccard clears `thresholdPpm`. One summary row
    * (`n_candidates`, `n_true`, `precision_ppm`) — the number that
    * says whether band/row parameters are wasting verifier compute on
    * junk candidates or (with [[lshBandStats]] and a recall probe)
    * need more bands.
    *
    * Scale shape: the candidate set is LSH-bounded (never all-pairs);
    * the exact-verify joins explode ONLY the candidate pairs' shingle
    * sets — cost tracks candidates, not the corpus.
    */
  def lshCandidatePrecision(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdPpm: Long = 500000L,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3
  ): DataFrame = {
    val pairs = minhashPairs(docs, idCol, textCol, numHashes, rowsPerBand, shingleN)
    val sh = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        explode(graft.ext.TextOps.shingleSet(col(textCol), shingleN)).as("__sh"))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__n"))
    val inter = pairs
      .join(sh.select(col("__id").as("id_a"), col("__sh")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh")), Seq("id_b", "__sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("__jac", expr(
        "(coalesce(__inter, 0) * 1000000) DIV (__na + __nb - coalesce(__inter, 0))"))
      .agg(count(lit(1)).as("n_candidates"),
        // empty candidate set: sum() is NULL and n_true·10⁶ DIV 0 would be
        // NULL — pin the summary row to an explicit (0, 0, 0) instead of a
        // NULL metric (perfect-precision-on-nothing reads as defined zero)
        coalesce(sum(when(col("__jac") >= thresholdPpm, 1L).otherwise(0L)),
          lit(0L)).as("n_true"))
      .withColumn("precision_ppm",
        when(col("n_candidates") > 0,
          expr("(n_true * 1000000) DIV n_candidates")).otherwise(lit(0L)))
  }

  /** Blocking-quality eval — the two standard candidate-generation
    * metrics for record linkage (Christen 2012): PAIRS COMPLETENESS
    * (the share of TRUE matching pairs the blocking scheme surfaces —
    * blocking recall) and REDUCTION RATIO (the share of the n(n−1)/2
    * comparison space it prunes). Together with
    * [[lshCandidatePrecision]] this is the full quality sheet for
    * band/row tuning: precision says the candidates aren't junk,
    * completeness says nothing real was pruned, reduction says the
    * pruning was worth it.
    *
    * Truth is [[jaccardPairsPrefix]] — the PROVABLY-COMPLETE exact
    * pair set at `thresholdTenths` — so BOTH legs of the eval are
    * blocked/bounded (no brute-force side, unlike the q37/q38
    * canaries). Candidates are [[minhashPairs]]' banded set. One
    * summary row; `n_total_pairs` computes in a DECIMAL lane and
    * NULL-guards past BIGINT (the magnitude-guard convention).
    */
  def blockingEval(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdTenths: Int = 7,
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3
  ): DataFrame = {
    // ONE shingle pass feeds all three legs (the q119 duplicateSpans
    // idiom): the prefix-filter truth, the banded candidates (signature
    // from the stored base hashes), and the doc count — the corpus was
    // previously tokenized three times, which dominated the runtime
    val sets = shingleHashSets(docs, idCol, textCol, shingleN)
    val truth = jaccardPairsPrefixFromSets(sets, thresholdTenths)
      .select("id_a", "id_b").localCheckpoint(false)
    val cands = minhashPairsFromSets(sets, numHashes, rowsPerBand)
      .select("id_a", "id_b").localCheckpoint(false)
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nCand = cands.agg(count(lit(1)).as("n_candidates"))
    val nFound = truth.join(cands, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    // sets keeps exactly the docs with a non-empty shingle set
    val nDocs = sets.agg(coalesce(count(lit(1)), lit(0L)).as("n_docs"))
    nDocs.crossJoin(broadcast(nTrue)).crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nFound))
      .withColumn("n_total_pairs", expr(
        "CAST((CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1)) DIV 2" +
          " AS BIGINT)"))
      .withColumn("completeness_ppm", expr(
        "CASE WHEN n_true > 0 THEN (n_found * 1000000) DIV n_true" +
          " ELSE CAST(0 AS BIGINT) END"))
      .withColumn("reduction_ratio_ppm", expr(
        "CASE WHEN n_total_pairs > 0 THEN CAST(1000000 -" +
          " (CAST(n_candidates AS DECIMAL(38,0)) * 1000000)" +
          " DIV n_total_pairs AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
      .select(col("n_docs"), col("n_total_pairs"), col("n_candidates"),
        col("n_true"), col("n_found"), col("completeness_ppm"),
        col("reduction_ratio_ppm"))
  }

  /** Duplicate-n-gram exposure rate — the corpus-level "how much of
    * each document is boilerplate/duplicated text" readout that decides
    * whether a dedup pass is worth running at all (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * measures exactly this before/after): per document, the fraction
    * of its DISTINCT word n-grams whose corpus document frequency is
    * ≥ `minDf` (they appear in at least that many distinct documents).
    * A 90%-duplicated page is boilerplate even if no single whole-doc
    * near-dup pair exists — this catches what pairwise dedup misses.
    *
    * Exactness: shingles are per-doc DISTINCT (the [[jaccardPairs]]
    * shingle-set), so one `groupBy(hash)` count IS the document
    * frequency; a 32-bit hash collision merges two shingles'
    * frequencies (probability < 2⁻³² per pair, deterministic, oracle
    * hashes identically). Rate in integer ppm.
    *
    * Scale shape: explode → one hash-aggregate on the shingle hash →
    * one semi-join back — all linear in total shingles, NO pair
    * generation anywhere (this is the dedup-family operator that needs
    * no bucket cap: document frequency is a count, not a combination).
    */
  def dupNgramRate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      minDf: Long = 2L
  ): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2: $minDf")
    val shingleArr = TextOps.shingleSet(col(textCol), shingleN)
    val hashed = docs
      .select(col(idCol).as("id"), explode(shingleArr).as("sh"))
      .select(col("id"), Hashing.md5Hash32(0, col("sh")).as("h"))
      .localCheckpoint(false)
    val dupShingles = hashed.groupBy("h")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("h")
    val perDoc = hashed
      .join(dupShingles, Seq("h"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_dup"))
    docs.select(col(idCol).as("id"), size(shingleArr).as("n_shingles"))
      .filter(col("n_shingles") > 0)
      .join(perDoc, Seq("id"), "left")
      .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
      .withColumn("dup_ppm", expr("(n_dup * 1000000) DIV n_shingles"))
      .select(col("id"), col("n_shingles").cast("long").as("n_shingles"),
        col("n_dup"), col("dup_ppm"))
  }
}
