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
}
