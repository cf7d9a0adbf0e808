package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fastText-style hashed-bag-of-ngrams linear quality scorer — the
  * model-based document-quality gate of public LLM data pipelines
  * (CCNet's fastText filter; fastText itself is public: Joulin et al.
  * 2016, arXiv:1607.01759). Features are unigrams + word bigrams
  * hashed into `dim` buckets (the hashing trick — no vocabulary
  * object, so the "model" ships as a (bucket, weight) TABLE, exactly
  * how a trained linear model exports); score = sigmoid(bias + mean
  * bucket weight over the document's grams).
  *
  * Scale shape: tokenize+gram is narrow, the weight table joins as a
  * BROADCAST (dim rows — a 2M-bucket model is ~32 MB, executor-local),
  * and the only shuffle is the per-doc partial-aggregated groupBy.
  * Weight summation is DECIMAL(28,10) so the per-doc sum is exact and
  * order-free — a double sum would hash-flake under parallel
  * reordering (same discipline as the repo's dsum pattern).
  *
  * Hashing is the engine-portable md5-60 family ([[Dedup.md5Hash60]]),
  * so a SQL oracle replays bucket ids — and therefore scores —
  * bit-for-bit.
  */
object QualityClassifier {

  /** Unigrams + word bigrams of the whitespace tokens, WITH repeats
    * (counts matter to a linear scorer; near-dup shingling dedups, this
    * must not). A single-token doc emits its token twice (the unigram
    * and the degenerate 1-word "bigram" slice) — consistent across
    * engines, harmless to the mean. */
  private[text] def grams(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = TextAnalysis.tokens(text)
    concat(toks, transform(
      sequence(lit(1), greatest(size(toks) - 1, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2)))))
  }

  /** Score `docs` with a (bucket: long, weight: double) model table:
    * quality_prob = sigmoid(bias + Σ weight(bucket(gram)) / n_grams).
    * Buckets absent from `weights` contribute 0 (sparse models are
    * fine). Output: (idCol, n_grams, quality_prob rounded to 6). */
  def score(docs: DataFrame, weights: DataFrame, dim: Int, bias: Double = 0.0,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"QualityClassifier.score: dim must be > 0, got $dim")
    // hash natively WITHOUT building bigram strings: the gram array is
    // unigrams ++ bigrams, so its hash array is exactly
    // Md5Hashes60(tokens) ++ Md5WindowHashes60(tokens, 2) — same
    // values in the same order as Md5Hashes60(grams(text)) (including
    // the single-token degenerate window), with the interpreted
    // concat_ws/slice lambda and every joined-string allocation gone
    val V = org.apache.spark.sql.graftext.VectorExpressions
    val toks = TextAnalysis.tokens(col(textCol))
    val exploded = docs
      .select(col(idCol), explode(concat(
        V.md5Hashes60(toks), V.md5WindowHashes60(toks, 2))).as("_h"))
      .select(col(idCol), pmod(col("_h"), lit(dim.toLong)).as("_bucket"))
    val wt = weights.select(col("bucket").as("_bucket"),
      col("weight").cast("decimal(28,10)").as("_w"))
    exploded
      .join(broadcast(wt), Seq("_bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_w"), lit(0).cast("decimal(28,10)"))).as("_sw"))
      .select(col(idCol), col("n_grams"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + col("_sw").cast("double") / col("n_grams")))), 6)
          .as("quality_prob"))
  }

  /** Deterministic synthetic model for plumbing verification (and the
    * catalog oracle): weight(b) = ((md5-60("qw:" + b) mod 2001) − 1000)
    * / 1000 ∈ [−1, 1], replayable in any engine with md5. Real
    * deployments load an exported trained table instead. */
  def syntheticWeights(spark: SparkSession, dim: Int, salt: String = "qw:"): DataFrame =
    spark.range(dim.toLong).select(col("id").as("bucket"),
      ((Dedup.md5Hash60(concat(lit(salt), col("id").cast("string"))) % 2001 - 1000) / 1000.0)
        .as("weight"))
}
