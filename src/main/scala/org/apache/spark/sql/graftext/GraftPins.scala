package org.apache.spark.sql.graftext

import org.apache.spark.sql.Dataset

/** Registry of DURABLE checkpointed datasets — shared faces a workload
  * builds once per dataset and reuses across queries (the
  * [[graft.ops.GraphOps.GraphFace]] cache). A benchmark harness
  * that sweeps leftover pinned blocks between queries (unpersisting
  * every `getPersistentRDDs` entry — the right hygiene for per-query
  * round checkpoints) must SKIP these: a localCheckpointed RDD's
  * lineage is truncated, so unpersisting it doesn't free a cache, it
  * destroys the data (`CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND` on the next
  * reader).
  *
  * Lives in the spark.sql namespace because extracting the persisted
  * RDD behind a checkpointed Dataset reads `LogicalRDD.rdd`
  * (private[sql]).
  */
object GraftPins {
  private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Register the persisted RDD(s) backing a checkpointed dataset. */
  def pin(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.foreach(id => { ids.add(id); () })

  /** Deregister AND unpersist a previously pinned dataset — the face
    * is being discarded (its cache entry was replaced because the
    * dataset files changed, or its session ended), so its blocks must
    * become reclaimable again: a pin with no unpin path would hold
    * every stale face's localCheckpoint blocks for the JVM's lifetime
    * (sweepers skip pinned ids by contract, and nothing else frees
    * them). Safe on a stopped context: the unpersist failure is
    * swallowed, the id still leaves the registry. */
  def unpin(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach { r =>
      ids.remove(r.id)
      try r.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }

  /** Is this RDD a registered durable face? (Sweepers must skip it.) */
  def isPinned(rddId: Int): Boolean = ids.contains(rddId)

  /** Registered pin count (test observability). */
  def pinnedCount: Int = ids.size

  /** The session's collision-free stable id (`sessionUUID` is
    * private[sql]; this is the face-cache key — identity hashes can
    * repeat across GC'd sessions, a UUID cannot). None for a
    * non-classic session implementation. */
  def sessionUuid(s: org.apache.spark.sql.SparkSession): Option[String] = s match {
    case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }

  /** Per-session reentrancy state for [[withAqeOff]]: only the
    * OUTERMOST entry snapshots the previous conf value and only the
    * matching outermost exit restores it. Without the depth counter,
    * two overlapping `withAqeOff` bodies in one session race the
    * read-modify-restore: the second entry snapshots the 'false' the
    * first just set, and its finally restores 'false' — leaving AQE
    * permanently disabled for the session (the r13 ADVICE sticky-
    * restore race). States are keyed by session and never removed —
    * one small object per session for the JVM's lifetime, bounded by
    * session count (removal would race a thread still holding the
    * old state object through computeIfAbsent). */
  private final class AqeState { var depth = 0; var prev: Option[String] = None }
  private val aqeStates =
    new java.util.concurrent.ConcurrentHashMap[String, AqeState]()

  /** Run `body` with AQE disabled in the session conf, restoring the
    * previous value after the OUTERMOST nested/concurrent call exits
    * (per-session depth counter — see [[AqeState]]). WHY: a checkpoint
    * materialized under AQE records `UnknownPartitioning` on its
    * LogicalRDD (an adaptive plan reports no partitioning until its
    * final plan, and the checkpoint captures the metadata before
    * that), which silently DISCARDS the layout a face's repartition
    * just paid for — every downstream consumer then re-exchanges the
    * face (measured r13: the u-partitioned sym self-join planned 2
    * exchanges under AQE-on checkpointing, 0 when the checkpoint was
    * built AQE-off and queried AQE-on; the metadata, not the layout,
    * was the loss). Scope caveat: the toggle is session-conf-wide for
    * the duration of `body`, so unrelated plans COMPILED concurrently
    * in the same session during a face build would also lose AQE —
    * the depth counter makes overlap SAFE (no sticky restore), not
    * side-effect-free. */
  def withAqeOff[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val k = "spark.sql.adaptive.enabled"
    val key = sessionUuid(spark)
      .getOrElse("@" + System.identityHashCode(spark))
    val st = aqeStates.computeIfAbsent(key, _ => new AqeState)
    st.synchronized {
      if (st.depth == 0) {
        st.prev = spark.conf.getOption(k)
        spark.conf.set(k, "false")
      }
      st.depth += 1
    }
    try body
    finally st.synchronized {
      st.depth -= 1
      if (st.depth == 0) st.prev match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }
}
