package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.VectorExpressions

/** Data-layout management: multi-dimensional clustering of a table's
  * files so range predicates prune at the FILE level before a single
  * row is read.
  *
  * A linear sort before write bounds each file's min/max on the leading
  * sort column only — a predicate on any other column still touches
  * every file. Z-ordering sorts by the Morton interleave of several
  * columns instead, giving every file a bounded min/max box in ALL
  * interleaved dimensions at once: a 100 TB corpus laid out by
  * (source_bucket, quality_bucket) serves `source = s AND quality > q`
  * scans from the few files whose box intersects the predicate, and
  * parquet row-group statistics prune the same way inside each file.
  * The write itself is one range-shuffle + per-partition sort — the
  * same cost shape as any sorted write, amortized over every
  * subsequent scan. */
object Layout {

  /** The Z-order value of `dims` (non-negative longs; values are masked
    * to `bitsPerDim` bits — normalize/bucket first; nDims·bitsPerDim ≤
    * 63). One codegen'd loop per row — see graftext.ZOrderLong. */
  def zorderValue(dims: Seq[Column], bitsPerDim: Int): Column =
    VectorExpressions.zorderLong(array(dims: _*), bitsPerDim)

  /** Write `df` as parquet clustered on the Z-curve of `dims`:
    * range-partition by the z-value into `nFiles` contiguous curve
    * chunks (range, not hash — the curve's locality IS the point), sort
    * within each, drop the helper column, write. The range exchange
    * samples z-value quantiles, so skewed dimension distributions still
    * yield balanced files. */
  def writeZOrdered(df: DataFrame, dims: Seq[Column], bitsPerDim: Int,
                    path: String, nFiles: Int): Unit =
    df.withColumn("_z", zorderValue(dims, bitsPerDim))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction: rewrite a table into ~`targetRecordsPerFile`
    * files, preserving (optional) hive partitioning and (optional) sort
    * order. Streaming ingest and fine-grained incremental jobs leave
    * thousands of KB-scale files per partition; at 100 TB that is
    * millions of scan tasks, per-file open/footer costs dominating, and
    * a straggling driver listing — compaction is the standing
    * maintenance job every lakehouse runs.
    *
    * Shape: one exact count (cheap, columnar metadata), then ONE
    * shuffle — `repartitionByRange` over the sort keys when given
    * (keeps min/max file statistics tight for pruning; this is how a
    * z-ordered table is re-compacted without losing the curve: pass the
    * z-value column), plain `repartition` otherwise — and a partitioned
    * write. `maxRecordsPerFile` bounds the worst file when partition
    * skew concentrates rows; target file COUNT comes from the row
    * count, so the operator needs no byte-size estimation pass. */
  def compact(df: DataFrame, targetRecordsPerFile: Long, outPath: String,
              sortCols: Seq[Column] = Nil,
              partitionCols: Seq[String] = Nil): Unit = {
    require(targetRecordsPerFile > 0,
      s"compact: targetRecordsPerFile must be > 0, got $targetRecordsPerFile")
    val n = df.count()
    val nFiles = math.max(1L, (n + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val clustered =
      if (sortCols.nonEmpty) df.repartitionByRange(nFiles, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
      else df.repartition(nFiles)
    val writer = clustered.write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(outPath)
  }

  /** Write `df` as a BUCKETED (and per-bucket sorted) managed table —
    * the co-located-join layout. Two fact tables bucketed on their join
    * key with the same bucket count join with ZERO exchange: each task
    * reads bucket i of both sides, so the 100 TB fact-to-fact join that
    * would otherwise shuffle both inputs every run pays its shuffle
    * ONCE at write time and never again (the classic hash-clustered
    * warehouse layout; Spark reads the bucket spec from the catalog and
    * plans a shuffle-free SortMergeJoin — with `sortCols` = the join
    * key, the per-task sort disappears too). Bucket count is fixed at
    * write: pick it so one bucket of the LARGER table fits an executor
    * core's scan appetite (≈ table_bytes / 128–512 MB), and give both
    * sides the SAME count — Spark 3+ can coalesce mismatched counts
    * when one divides the other, but equal counts hit the fast path. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"writeBucketed: nBuckets must be > 0, got $nBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
