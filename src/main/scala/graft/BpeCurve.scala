package graft

import graft.corpus.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-time curve for the BPE merge loop past demo size (the r8
  * verdict's scale question): run learnBpeMerges at growing nMerges on
  * one corpus and print a JSON line per point, so the committed curve
  * shows cost is LINEAR per merge (the every-25-merges re-checkpoint
  * keeps plan depth flat; without it the stacked replaces make round i
  * cost O(i)).
  *
  * The driver's synthetic documents draw from a 31-word vocabulary,
  * which a greedy BPE fully fuses in 89 merges — past that the curve
  * would only time empty argmax jobs. The measurement corpus therefore
  * rewrites each text to TRI-TOKEN words (every consecutive token
  * triple fused into one ~15-char word): same corpus size, ~31³
  * distinct dictionary words, thousands of learnable merges — an
  * unsaturated dictionary at every measured point, like a real
  * tokenizer corpus. The operator under test is unchanged.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BpeCurve"
  */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val points = sys.env.getOrElse("SPARK_GRAFT_BPE_POINTS", "50,100,250,500")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val toks = split(col("text"), "\\s+")
    val docs = Tables.documents(spark, sfDir)
      .withColumn("text",
        concat_ws(" ", transform(
          sequence(lit(0), greatest(size(toks) - 3, lit(0))),
          i => concat(element_at(toks, i + 1),
            element_at(toks, i + 2), element_at(toks, i + 3)))))
    // JVM+codegen warmup so the first point isn't startup-inflated
    Corpus.learnBpeMerges(docs, nMerges = 5).collect()
    // batch > 1 measures the batched-round scheduler (up to `batch`
    // pairwise-independent merges per pair-count job — see bpeCore):
    // the r9 curve proved per-merge cost is pure round latency, so the
    // batched curve should show ~batch× fewer rounds ≈ ~batch× less
    // wall time at equal vocab
    val batches = sys.env.getOrElse("SPARK_GRAFT_BPE_BATCH", "1")
      .split(",").map(_.trim.toInt).toSeq
    for (nm <- points; b <- batches) {
      val t0 = System.nanoTime()
      val merges = Corpus.learnBpeMerges(docs, nMerges = nm, batch = b).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"bpe_merge_curve","nMerges":$nm,"batch":$b,"learned":${merges.length},"value":$sec%.2f,"unit":"sec","secPerMerge":${sec / nm}%.4f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
