package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the learned stage modern curation
  * pipelines run after the heuristic gates (the CCNet / quality-classifier
  * pattern): a logistic regression over the engine's deterministic
  * per-document quality signals, trained on a labeled sample, applied as
  * a distributed scalar scoring expression.
  *
  * Scale split (the part that matters at 100 TB):
  *  - TRAINING data is labeled — human or LLM judgments — and therefore
  *    inherently small (thousands to low millions of rows, nothing like
  *    corpus scale). `train` collects the labeled sample (bounded by
  *    `maxRows`, refuses above it) and runs full-batch gradient descent
  *    on the driver: deterministic, dependency-free, seconds.
  *  - SCORING is the corpus-scale part and is a pure per-row column
  *    expression over [[features]] with the trained weights inlined as
  *    literals — codegen-friendly (no UDF, no HOF lambdas), shuffle-free,
  *    embarrassingly parallel.
  */
object QualityModel {

  /** Number of features [[features]] emits (bias included). */
  val NumFeatures = 6

  /** Deterministic per-document feature columns, each in [0, 1]:
    * bias, saturating token count, type-token ratio, saturating mean word
    * length, duplicate-BIGRAM fraction (phrase repetition — independent
    * of the unigram type-token ratio, unlike the duplicate-word fraction,
    * which is exactly 1 − TTR and would be collinear), and
    * alphabetic-character fraction. Built from the same integer-exact
    * signals the heuristic gates use.
    */
  def features(text: Column): Seq[Column] = {
    val total = TextOps.tokenCount(text)
    val distinctToks = size(array_distinct(TextOps.tokens(text))).cast("long")
    val chars = length(text).cast("long")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    val safeTotal = greatest(total, lit(1L))
    val safeChars = greatest(chars, lit(1L))
    val meanWordLen = (chars - (total - 1)).cast("double") / safeTotal
    val bi = TextOps.shingles(text, 2)
    val nBi = size(bi).cast("long")
    val dupBiFrac = when(nBi > 0,
      (nBi - size(array_distinct(bi)).cast("long")).cast("double") / nBi)
      .otherwise(lit(0.0))
    Seq(
      lit(1.0),
      least(total.cast("double") / 100.0, lit(1.0)),
      distinctToks.cast("double") / safeTotal,
      least(meanWordLen / 10.0, lit(1.0)),
      dupBiFrac,
      alpha.cast("double") / safeChars)
  }

  /** Train logistic-regression weights on a labeled frame
    * (`labelCol` ∈ {0, 1}). Full-batch gradient descent with a fixed
    * epoch count — deterministic for a fixed input (rows are collected
    * through a stable sort on all feature values + label).
    */
  def train(
      labeled: DataFrame,
      textCol: String = "text",
      labelCol: String = "label",
      epochs: Int = 300,
      learningRate: Double = 1.0,
      maxRows: Int = 1 << 20
  ): Array[Double] = {
    val fs = features(col(textCol))
    val rows = labeled
      // labeled samples routinely carry nulls; a null text/label would
      // otherwise surface as an opaque unboxing NPE mid-collect
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(array(fs: _*).as("f"), col(labelCol).cast("double").as("y"))
      .limit(maxRows + 1)
      .collect()
    require(rows.length <= maxRows,
      s"labeled training set exceeds $maxRows rows; quality-classifier " +
        "labels are sample-scale by nature — subsample before training")
    val data = rows.map { r =>
      (r.getSeq[Double](0).toArray, r.getDouble(1))
    }.sortBy { case (f, y) => (f.mkString(","), y) }
    val n = data.length.max(1)
    val w = new Array[Double](NumFeatures)
    var e = 0
    while (e < epochs) {
      val grad = new Array[Double](NumFeatures)
      data.foreach { case (f, y) =>
        var dot = 0.0
        var i = 0
        while (i < NumFeatures) { dot += w(i) * f(i); i += 1 }
        val err = 1.0 / (1.0 + math.exp(-dot)) - y
        i = 0
        while (i < NumFeatures) { grad(i) += err * f(i); i += 1 }
      }
      var i = 0
      while (i < NumFeatures) { w(i) -= learningRate * grad(i) / n; i += 1 }
      e += 1
    }
    w
  }

  /** P(high quality) under trained weights — a flat per-row scalar
    * expression (weights inlined as literals, no arrays or lambdas in the
    * plan), ready for `filter(score >= cutoff)` at corpus scale.
    */
  def score(text: Column, weights: Array[Double]): Column = {
    require(weights.length == NumFeatures, s"expected $NumFeatures weights")
    val dot = features(text).zip(weights)
      .map { case (f, wi) => f * lit(wi) }
      .reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-dot))
  }
}
