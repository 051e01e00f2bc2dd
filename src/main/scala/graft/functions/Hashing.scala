package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Portable deterministic hash family used by dedup / fingerprint operators.
  *
  * Built on `md5` (identical across Spark, DuckDB, and virtually every
  * engine) rather than Spark's murmur3 `hash()`, so every hash-based
  * operator stays oracle-checkable bit-for-bit. The first 8 hex chars of
  * the digest give an unsigned 32-bit value — plenty for MinHash/SimHash
  * banding, and cheap to compute in whole-stage codegen (md5 + substring +
  * conv are all codegen'd built-ins).
  */
object Hashing {

  /** h_seed(s) = uint32 from md5("<seed>:<s>") — via the codegen'd
    * [[Md5Hash32Expr]] (bit-identical to
    * `conv(substring(md5(...),1,8),16,10)`, which the SQL oracles use).
    */
  def md5Hash32(seed: Column, s: Column): Column =
    ColumnBridge.column(Md5Hash32Expr(
      ColumnBridge.expression(concat(seed.cast("string"), lit(":"), s))))

  def md5Hash32(seed: Int, s: Column): Column = md5Hash32(lit(seed), s)

  /** Full 128-bit content fingerprint as hex (document identity hash). */
  def fingerprint(s: Column): Column = md5(s)

  /** Uniform double in [0,1) derived from the hash — deterministic
    * pseudo-randomness usable inside SQL-expressible operators.
    */
  def hashUnit(seed: Column, s: Column): Column =
    md5Hash32(seed, s).cast("double") / lit(4294967296.0)

  /** Largest prime below 2^32 — modulus of the MinHash universal-hash
    * family.
    */
  val MinhashPrime = 4294967291L

  /** Affine universal-hash coefficients (a_j, b_j) for h_j(x) =
    * (a_j·x + b_j) mod [[MinhashPrime]]. One expensive base hash per
    * shingle, then numHashes cheap affine transforms — 16× fewer md5
    * evaluations than a seeded-md5 family. a_j < 2^20 keeps a_j·x < 2^52,
    * safely inside BIGINT (and even double) range for any engine.
    * Deterministic (java.util.Random sequence is specified), and exposed
    * so the SQL oracle can inline the identical constants.
    */
  def minhashParams(numHashes: Int, seed: Long = 7L): (Seq[Long], Seq[Long]) = {
    val rnd = new java.util.Random(seed)
    val as = Seq.fill(numHashes)(1L + rnd.nextInt((1 << 20) - 1).toLong)
    val bs = Seq.fill(numHashes)(rnd.nextInt(1 << 30).toLong)
    (as, bs)
  }
}
