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

  // ---------------------------------------------------------------- exact

  /** Exact-dup groups: one row per distinct content with the id kept
    * (lowest) and the number of copies. Deterministic, unlike
    * `dropDuplicates` which keeps an arbitrary row.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup keeping the lowest-id row of each content group (window
    * min over the fingerprint — one shuffle, no join).
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(TextOps.fingerprint(col(textCol)))
    docs.withColumn("__keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keep"))
      .drop("__keep")
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature rows `(id, j, mh)` for `numHashes` seeded hash
    * functions over distinct n-gram shingles. One explode + one (id, j)
    * shuffle; linear in corpus size.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      shingleN: Int = 3
  ): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextOps.shingleSet(col(textCol), shingleN)).as("sh"))
      .select(col("id"), explode(sequence(lit(0), lit(numHashes - 1))).as("j"), col("sh"))
      .groupBy("id", "j")
      .agg(min(Hashing.md5Hash32(col("j"), col("sh"))).as("mh"))

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

  /** Candidate near-dup pairs: docs sharing at least one full LSH band.
    * Equi-join on (band, bkey) — shuffle-scalable, no cross product.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleN: Int = 3
  ): DataFrame = {
    val bands = lshBandKeys(
      minhashSignatures(docs, idCol, textCol, numHashes, shingleN), rowsPerBand)
    val a = bands.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("bkey"), col("id").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  // -------------------------------------------------------------- jaccard

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    * Token-join (shuffle on shingle) — exact verifier for MinHash; at
    * 100 TB prefer [[minhashPairs]] (frequent shingles make this join
    * super-linear).
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(TextOps.shingleSet(col(textCol), shingleN)).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("id").as("id_a"), col("sh"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
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

  /** SimHash near-dup pairs: block on 8-bit bands of the fingerprint, then
    * keep pairs with Hamming distance ≤ maxHamming. Never all-pairs.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey", call_function("shiftright", col("simhash"), col("band") * 8) % 256)
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("simhash").as("h_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------- embedding near-dup

  /** Exact embedding-cosine near-dup pairs (all-pairs; verifier scale).
    * The 100 TB path buckets by LSH first (see SimSearch.hyperplaneLsh).
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.9
  ): DataFrame = {
    val a = embeddings.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
