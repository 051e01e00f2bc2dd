package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count–min sketch (Cormode & Muthukrishnan 2005) as a typed mergeable
  * `Aggregator` — approximate per-key frequencies in `depth × width`
  * LONG counters of constant size, completing the sketch family next to
  * HLL distinct counts ([[graft.ops.Sketches]]) and Misra–Gries heavy
  * hitters ([[HeavyHitters]]). Where MG answers "which keys are
  * frequent", CMS answers "how frequent is THIS key" for any key,
  * without storing keys at all.
  *
  * Guarantees (standard CMS, spec-pinned):
  *  - `estimate(key) = min_r counter[r][h_r(key) mod width]` NEVER
  *    underestimates the true count;
  *  - overestimate ≤ 2·n/width with probability ≥ 1 − (1/2)^depth
  *    (n = total insertions);
  *  - partials merge by ELEMENTWISE ADDITION — commutative and
  *    associative in exact integer arithmetic, so the sketch is
  *    bit-identical under any partitioning or merge order (map-side
  *    combine ships depth·width longs per task regardless of row
  *    count).
  *
  * The hash family is the repo's portable md5-32 ([[Md5Hash32Expr]]
  * semantics: first 4 digest bytes of `"<row>:<key>"`), so a SQL oracle
  * recomputes every counter AND every estimate bit-for-bit
  * (`q154_cms_counts`) — the property no murmur/xxhash sketch offers.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(depth >= 1 && width >= 1, s"bad CMS shape: $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], key: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      b(r * width + CountMinSketch.bucket(r, key, width)) += 1L
      r += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMinSketch {
  def apply(depth: Int, width: Int): CountMinSketch =
    new CountMinSketch(depth, width)

  private val localDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** JVM twin of [[Md5Hash32Expr]] over `"<seed>:<key>"` — unsigned
    * 32-bit from the first four MD5 digest bytes. Must stay bit-identical
    * to the expression (and to the oracle idiom
    * `('0x'||substr(md5(seed||':'||key),1,8))::BIGINT`).
    */
  def hash32(seed: Int, key: String): Long = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest((seed.toString + ":" + key).getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Row-`seed` bucket of `key` — hash is unsigned, so `%` is floor-mod. */
  def bucket(seed: Int, key: String, width: Int): Int =
    (hash32(seed, key) % width).toInt
}
