package graft.streaming

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingest: the pretraining-data preparation flow
  * (quality gate → dedup → per-language accounting) as a continuous
  * Structured Streaming job over documents arriving with an ingest
  * timestamp. The batch form is `x_corpus_pipeline`; this is the same
  * logic with state bounded by the watermark:
  *
  *   - the quality gate and fingerprinting are stateless, narrow, and
  *     identical to the batch operators (same native text_stats pass);
  *   - dedup keys on the whitespace/case-robust fingerprint via
  *     `dropDuplicatesWithinWatermark` — a duplicate arriving later
  *     than the watermark delay is NOT collapsed (documented streaming
  *     tradeoff; exact global dedup remains the batch job);
  *   - accounting is a watermarked tumbling-window aggregation, so
  *     late docs beyond the delay are dropped and state is bounded.
  */
object CorpusStream {

  /** docs: streaming frame with (ingest_ts timestamp, doc_id, lang,
    * text). Returns per-(window, lang) doc and token counts of the
    * kept, deduplicated stream. */
  def ingest(docs: DataFrame, minQuality: Int = 60,
             windowDur: String = "1 hour",
             watermark: String = "1 hour"): DataFrame = {
    val t = col("text")
    val scored = docs
      .withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"), col("doc_id"), col("lang"), t,
        TextAnalysis.textStats(t).as("st"))
      .select(col("ingest_ts"), col("doc_id"), col("lang"), t,
        col("st.n_tokens").as("n_tokens"),
        TextAnalysis.qualityScoreFrom(col("st"), t).as("quality"))
    scored
      .filter(col("quality") >= minQuality)
      .withColumn("fp", TextAnalysis.fingerprint(t))
      .dropDuplicatesWithinWatermark("fp")
      .groupBy(window(col("ingest_ts"), windowDur), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("lang"), col("n_docs"), col("total_tokens"))
  }
}
