package graft.corpus

import graft.{SparkSpec, Tables}

/** packShards' two-phase prefix sum against the sf0.01 corpus, including
  * the trap that bit the catalog: a downstream coalesce(1) collapses the
  * final pass into one task, so the partition identity must ride in the
  * data (a cached `_pid` column), never come from TaskContext. */
class ShardPackScaleSpec extends SparkSpec {

  private def reference(out: Array[(Long, String, Int, Long)], budget: Long): Map[Long, Long] =
    out.map(t => (t._1, t._2, t._3)).groupBy(_._2).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      val cums = sorted.map(_._3.toLong).scanLeft(0L)(_ + _).init
      sorted.zip(cums).map { case ((id, _, _), c) => id -> (c / budget) }.toSeq
    }.toMap

  test("packShards matches the driver-side reference on sf0.01 documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = Corpus.packShards(docs, budgetTokens = 1000L, strataCol = "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val ref = reference(out, 1000L)
    val bad = out.filter(t => ref(t._1) != t._4)
    assert(bad.isEmpty, s"${bad.length} mismatched, e.g. ${bad.take(5).toSeq}")
  }

  test("packShards survives a downstream coalesce(1) (partition ids carried in data)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = Corpus.packShards(docs, budgetTokens = 1000L, strataCol = "lang")
      .coalesce(1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val ref = reference(out, 1000L)
    val bad = out.filter(t => ref(t._1) != t._4)
    assert(bad.isEmpty,
      s"coalesce(1) must not disturb shard offsets; ${bad.length} mismatched, e.g. ${bad.take(5).toSeq}")
  }
}
