package graft.streaming

import graft.etl.Scd
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD type-2 dimension maintenance: a CDC update stream
  * merges into a persisted current slice, micro-batch by micro-batch —
  * the streaming face of [[graft.etl.Scd.scd2Merge]], composed the same
  * `foreachBatch`-applies-the-batch-operator way as the corpus ingest
  * tier (stream == batch semantics by construction, no parallel
  * implementation to drift).
  *
  * Within one micro-batch a key may update several times; the batch is
  * compacted to its LAST row per key first (ordered by the caller's
  * `seqCol` — CDC offsets, LSNs), which is standard CDC compaction:
  * intermediate same-batch versions are not recorded as history rows.
  *
  * Persistence layout (the Scd scaladoc's deployment shape made
  * concrete): `slicePath` holds the current slice and is atomically
  * swapped per batch (write next slice → rename); `historyPath` gets
  * this batch's CLOSED rows under a `_batch_id=` partition written with
  * dynamic partition overwrite, so foreachBatch's at-least-once replay
  * of a batch overwrites its own partition instead of duplicating it.
  * The merged result is localCheckpointed BEFORE any directory is
  * touched — both writes would otherwise lazily re-scan the slice being
  * replaced. A production deployment would put the slice behind a
  * transactional table format; the merge math and layout are identical.
  */
object DimStream {

  /** Start the maintenance query. `batchTs` maps the micro-batch id to
    * the SCD effective timestamp (injected, not wall-clock, so replays
    * and tests are deterministic). Updates must carry `key`, `tracked`
    * and `seqCol`. */
  def maintainScd2(updates: DataFrame, slicePath: String, historyPath: String,
                   checkpoint: String, key: String, tracked: Seq[String],
                   seqCol: String, batchTs: Long => Column): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val ts = batchTs(batchId)
        // CDC compaction: last row per key by seqCol (struct max keeps
        // the tracked values that belong to the winning sequence number)
        val compacted = batch
          .groupBy(col(key))
          .agg(max(struct(col(seqCol) +: tracked.map(col): _*)).as("_last"))
          .select(col(key) +: tracked.map(c => col(s"_last.$c").as(c)): _*)
        val dim =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(slicePath)))
            spark.read.parquet(slicePath)
          else compacted.limit(0)
            .withColumn("valid_from", ts)
            .withColumn("valid_to", when(lit(false), ts))
            .withColumn("is_current", lit(true))
        val merged = Scd.scd2Merge(dim, compacted, key, tracked, ts)
          .localCheckpoint() // materialize before touching either dir
        merged.filter(!col("is_current"))
          .withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id")
          .parquet(historyPath)
        val next = slicePath + ".next"
        merged.filter(col("is_current"))
          .write.mode("overwrite").parquet(next)
        val target = java.nio.file.Paths.get(slicePath)
        if (java.nio.file.Files.exists(target)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(target).iterator().asScala.toSeq
            .reverse.foreach(java.nio.file.Files.delete)
        }
        java.nio.file.Files.move(java.nio.file.Paths.get(next), target)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
