package graft.etl

import org.apache.log4j.LogManager
import org.apache.spark.sql.{DataFrame, SparkSession}

/** I1: session factory (dependencies/spark.py:18-114). The py4j plumbing
  * and `--py-files` packaging of the reference disappear on the JVM;
  * what remains is env detection (DEBUG → local master) and sane
  * defaults for a large cluster (AQE on, shuffle partitions sized by
  * the caller, UTC session tz for deterministic timestamp rendering).
  */
object SessionFactory {

  /** Defaults a large-cluster deployment wants on from day one:
    *   - AQE + skew-join splitting + post-shuffle coalescing: runtime
    *     re-planning is what absorbs the stats errors and key skew that
    *     only appear at the 100 TB operating point;
    *   - 256 MiB scan splits: at 10⁵-10⁶ input files the default 128 MiB
    *     doubles the task count for no benefit once AQE coalesces
    *     downstream stages;
    *   - runtime row-level bloom filters: a selective join (the
    *     incremental-dedup anti-join, a filtered dim join) plants a
    *     bloom filter of the small side's keys into the big side's
    *     scan, cutting shuffle volume to the possibly-matching rows —
    *     at 100 TB that is the difference between shuffling the corpus
    *     and shuffling the candidates;
    *   - UTC session timezone: deterministic timestamp rendering
    *     regardless of driver locale;
    *   - nanosAsLong: nano-precision parquet timestamps read as raw
    *     longs (see Tables.events) — a session-level decision made once
    *     here, never mutated per-read on a shared session.
    * Everything is overridable via `extra`. */
  val clusterDefaults: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> (256L * 1024 * 1024).toString,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  def build(appName: String,
            master: Option[String] = None,
            shufflePartitions: Int = 32,
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder().appName(appName)
    val resolved = master.orElse(
      if (sys.env.contains("DEBUG")) Some("local[*]") else None)
    resolved.foreach(b.master)
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    (clusterDefaults ++ extra).foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}

/** I2: logging (dependencies/logging.py:10-52). The reference bridges
  * py4j into JVM log4j; here it's just log4j with the same
  * `<appName appId>` message prefix. */
trait JobLogging {
  def spark: SparkSession
  @transient private lazy val logger = LogManager.getLogger(getClass)
  private def prefix: String = {
    val sc = spark.sparkContext
    s"<${sc.appName} ${sc.applicationId}>"
  }
  def logInfo(msg: String): Unit = logger.info(s"$prefix $msg")
  def logWarn(msg: String): Unit = logger.warn(s"$prefix $msg")
  def logError(msg: String): Unit = logger.error(s"$prefix $msg")
}

/** The production job (jobs/etl_job.py:39-75): extract → 13-stage
  * transform → load behind the two config toggles.
  *
  * Deviation from the reference, on purpose: when BOTH sinks are
  * enabled the reference re-executes the whole plan per sink (no cache,
  * SURVEY.md §4.1). We persist the transformed result before the second
  * action — at 100 TB the output (post-join, post-dedup) is orders of
  * magnitude smaller than the input, so caching it is cheap and halves
  * the work.
  */
class EtlJob(val spark: SparkSession, cfg: EtlConfig) extends JobLogging {

  def extract(): (DataFrame, DataFrame) = {
    val logs = Sources.logs(spark, cfg.loadPath)
    val cats = cfg.loadDb match {
      case Some(db) => Sources.jdbc(spark, db)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.category)
    }
    (logs, cats)
  }

  def run(): Unit = {
    logInfo("etl job is up and running")
    val (logs, cats) = extract()
    val out = Pipeline.transformData(logs, cats, cfg.types, cfg.timezone)
    val sinks = Seq(cfg.dbInsert, cfg.fileWrite).count(identity)
    val result = if (sinks > 1) out.persist() else out
    if (cfg.dbInsert) cfg.saveDb.foreach(Sinks.jdbcAppend(result, _))
    if (cfg.fileWrite) Sinks.parquetAppend(result, cfg.savePath)
    if (sinks > 1) result.unpersist()
    logInfo("etl job is finished")
  }
}
