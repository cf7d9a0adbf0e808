package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join/aggregation/window headline queries on the TPC-H-ish star
  * schema — the bench workload. Plans are written for the 1000-executor
  * case: dimension sides broadcast explicitly, fact-side aggregations
  * rely on map-side partial agg, AQE coalesces post-shuffle partitions.
  */
object TpchQueries {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")
  private val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q6 shape: pure filter-scan global aggregation — the pushdown
    * showcase: every predicate reaches the parquet scan (row-group
    * min/max skipping at scale), the agg is a map-side partial into a
    * 1-row reduce. Products of two 2-decimal columns have at most four
    * decimals, so the decimal cast is exact in both engines. */
  val q6: Q = Q(
    "q6_filter_agg",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n")),
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """.trim)
  )

  /** Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem, revenue
    * per order. customer/orders filter early (pushdown), lineitem joins
    * on the shuffled orderkey; at 100 TB lineitem⋈orders is the one
    * real shuffle, customer broadcasts. */
  val q3: Q = Q(
    "q3_join_agg",
    (s, d) => {
      val cutoff = lit("1997-06-30").cast("timestamp")
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(revenue).as("revenue"))
    },
    Some("""
      SELECT l_orderkey, o_orderdate,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        AND l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
      GROUP BY l_orderkey, o_orderdate
    """.trim)
  )

  /** Q5 shape: 6-way join, revenue by nation. All dims (supplier,
    * customer, nation, region) broadcast; only lineitem⋈orders
    * shuffles. Note the TPC-H c_nationkey = s_nationkey co-location
    * predicate. */
  val q5: Q = Q(
    "q5_multi_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val supp = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(revenue).as("revenue"))
    },
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY n_name
    """.trim)
  )

  /** Window top-k: 3 biggest orders per customer. Deterministic via the
    * o_orderkey tiebreak; o_totalprice passes through untouched (no
    * float arithmetic → bit-identical to the oracle). */
  val w1: Q = Q(
    "w1_window_topk",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
      ) t WHERE rn <= 3
    """.trim)
  )

  /** Two-key equi self-join (the C12 join shape, jobs/etl_job.py:392):
    * per-(partkey,suppkey) stats joined against the same aggregate on
    * the composite key. Shaped for exchange reuse: BOTH join inputs
    * derive from ONE aggregation of lineitem (count and sum in the
    * same pass), so the plan scans and shuffles lineitem once and the
    * second branch is a ReusedExchange; the join itself inherits the
    * aggregation's hash partitioning on the two keys — no further
    * exchange (PlanAuditSpec asserts all three properties). The naive
    * detail-side join (join the raw rows, then re-aggregate) computes
    * the scan+agg subtree twice — Catalyst does not dedupe a
    * self-referenced subplan unless the exchanges are canonically
    * identical, and column pruning makes them differ the moment the
    * two branches project different columns. The tautological
    * n/total_qty equalities in the join condition exist exactly to
    * keep both branches' column sets — and therefore their exchanges —
    * identical (the values are deterministic: decimal sums are exact,
    * so the self-equality always holds). */
  val j1TwoKey: Q = Q(
    "j1_twokey_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
      // merge hint: at sf0.1 AQE otherwise flips this to a broadcast
      // join of the ~input-sized aggregate — losing the ReusedExchange
      // (the agg branch computes twice) and building a 600k-row hash
      // table; at 100 TB that flip is impossible anyway (the agg side
      // is near table-sized), so pinning SMJ keeps the measured plan
      // THE scale plan: one lineitem shuffle, both join inputs reading
      // the same exchange, sorts only over the already-partitioned agg.
      // The extra predicates are tautological (decimal sums are exact,
      // so a key always >= its own stats) and exist to keep BOTH
      // branches' column sets — and therefore their exchanges —
      // canonically identical for the reuse; they are INEQUALITIES
      // deliberately: an equality would be extracted as a join KEY
      // (ExtractEquiJoinKeys), forcing SMJ to co-partition on all four
      // columns and re-shuffle both sides on top of the agg's exchange
      ps.join(ps.select(col("l_partkey").as("partkey"),
            col("l_suppkey").as("suppkey"),
            col("n").as("n2"), col("total_qty").as("total_qty2")).hint("merge"),
          col("l_partkey") === col("partkey") && col("l_suppkey") === col("suppkey") &&
            col("n") >= col("n2") && col("total_qty") >= col("total_qty2"))
        .select(col("l_partkey"), col("l_suppkey"), col("n"),
          col("total_qty2").as("total_qty_max"))
    },
    Some("""
      SELECT l_partkey, l_suppkey, COUNT(*) AS n, MAX(total_qty) AS total_qty_max
      FROM lineitem
      JOIN (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_partkey, l_suppkey
      ) ps ON l_partkey = partkey AND l_suppkey = suppkey
      GROUP BY l_partkey, l_suppkey
    """.trim)
  )

  /** Offset window functions: per-user previous/next event deltas (the
    * time-series idiom behind as-of lookups). */
  val w2Lag: Q = Q(
    "w2_lag_lead",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      graft.Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("secs_since_prev",
          (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("prev_type"), col("next_type"), col("secs_since_prev"))
    },
    Some("""
      SELECT event_id, user_id, event_type,
             LAG(event_type) OVER w AS prev_type,
             LEAD(event_type) OVER w AS next_type,
             epoch_us(ts) // 1000000 - epoch_us(LAG(ts) OVER w) // 1000000 AS secs_since_prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """.trim)
  )

  /** Running aggregation with an explicit ROWS frame. */
  val w3Running: Q = Q(
    "w3_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.Tables.events(s, d)
        .withColumn("running_value",
          sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("running_value"))
    },
    Some("""
      SELECT event_id, user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value
      FROM events
    """.trim)
  )

  /** Batch sessionization: session_window with a 30-minute gap, checked
    * against the classic gaps-and-islands SQL formulation. */
  val w4Session: Q = Q(
    "w4_session_window",
    (s, d) => graft.Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("session_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("user_id"), col("n_events"), col("session_value")),
    Some("""
      WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session,
               event_id
        FROM events),
      islands AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked)
      SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             user_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      FROM islands GROUP BY user_id, session_id
    """.trim)
  )

  /** Q4 shape: the EXISTS decorrelation benchmark — count a quarter's
    * orders per priority where SOME line item shipped after the order
    * date. Spark plans the EXISTS as a LEFT SEMI hash join on the
    * equi-key with the non-equi conjunct as a join residual — orders
    * are never multiplied by their line count (a naive inner join +
    * distinct would be), and the quarter filter pushes to the orders
    * scan so the semi join's build side is quarter-sized. (The
    * classic q4 tests l_commitdate < l_receiptdate; this dataset
    * carries neither, so late-vs-order-date keeps the shape.) */
  val q4: Q = Q(
    "q4_exists_semi",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
      GROUP BY 1
    """.trim)
  )

  /** Q12 shape: the big-big join + CASE-split rollup — a year of line
    * items joined to their orders on the shuffled orderkey, counted
    * into high/low priority classes per return flag. This is the one
    * query family where BOTH sides are data-sized, so the orderkey
    * sort-merge/shuffle-hash join IS the plan; the date filter still
    * pushes to the lineitem scan and orders projects to two columns
    * before the exchange. */
  val q12: Q = Q(
    "q12_case_split",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    """.trim)
  )

  /** Q14 shape: promo revenue share — one month of line items joined
    * to the part dimension (broadcast: parts are catalog-sized), the
    * share of revenue from one part type as a single percentage.
    * Revenue rides the [[dsum]] decimal discipline on BOTH the
    * conditional numerator and the total; the one double divide is
    * the rounded final answer. */
  val q14: Q = Q(
    "q14_promo_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "ECONOMY", rev)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") * 100 /
            sum(rev).cast("double"), 6).as("economy_revenue_pct"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT ROUND(CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100
                   / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6)
               AS economy_revenue_pct,
             COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """.trim)
  )

  def all: Seq[Q] = Seq(q3, q5, q6, w1, j1TwoKey, w2Lag, w3Running, w4Session,
    q4, q12, q14)
}
