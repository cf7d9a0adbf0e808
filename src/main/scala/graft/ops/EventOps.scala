package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The SURVEY §2 operator families (P/F/J/U/A) exercised on the driver
  * testdata — `events` is the structural analogue of the reference's
  * shopping-log table (JSON props + event_type + user id + timestamp),
  * so each reference operator is demonstrated on it with a DuckDB
  * oracle. Query names carry the §2 operator ids they cover.
  *
  * All queries are narrow or single-shuffle plans; every filter/projection
  * is expressed on columns (codegen, pushdown-friendly) — no UDFs.
  */
object EventOps {

  /** P1+P2+F1: projection + JSON key extraction (jobs/etl_job.py:174-175). */
  val p1Project: Q = Q(
    "p1_f1_project_json",
    (s, d) => Tables.events(s, d).select(
      col("event_id"),
      col("event_type").as("logtype"),
      col("user_id").cast(StringType).as("userid"),
      get_json_object(col("props"), "$.k").as("k")),
    Some("""
      SELECT event_id, event_type AS logtype,
             CAST(user_id AS VARCHAR) AS userid,
             json_extract_string(props, '$.k') AS k
      FROM events
    """.trim)
  )

  /** P3: conjunctive membership filter (jobs/etl_job.py:173). */
  val p3Filter: Q = Q(
    "p3_filter_isin",
    (s, d) => Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "view", "click") &&
        col("user_id").isin(1L, 2L, 3L, 5L, 8L, 13L))
      .select(col("event_id"), col("event_type"), col("user_id")),
    Some("""
      SELECT event_id, event_type, user_id FROM events
      WHERE event_type IN ('purchase','view','click')
        AND user_id IN (1,2,3,5,8,13)
    """.trim)
  )

  /** P4+P7+P8: null-predicate split + fallback (C11 analogue,
    * jobs/etl_job.py:353-366): synthesize a null userid (user 0), fall
    * back to a device-style id. */
  val p4Fallback: Q = Q(
    "p4_null_fallback",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("userid",
        when(col("user_id") === 0L, lit(null).cast(StringType))
          .otherwise(col("user_id").cast(StringType)))
      val nullBranch = ev.filter(col("userid").isNull)
        .select(col("event_id"), concat(lit("anon-"), col("event_id").cast(StringType)).as("userid"))
      val okBranch = ev.filter(col("userid").isNotNull)
        .select(col("event_id"), col("userid"))
      nullBranch.union(okBranch)
    },
    Some("""
      SELECT event_id, 'anon-' || CAST(event_id AS VARCHAR) AS userid
      FROM events WHERE user_id = 0
      UNION ALL
      SELECT event_id, CAST(user_id AS VARCHAR) AS userid
      FROM events WHERE user_id <> 0
    """.trim)
  )

  /** F2: timestamp-format normalization regex (jobs/etl_job.py:273-281)
    * applied to a second-precision ISO rendering of ts. */
  val f2Regex: Q = Q(
    "f2_regex_normalize",
    (s, d) => Tables.events(s, d).select(
      col("event_id"),
      regexp_replace(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        "(\\d+-\\d+-\\d+T\\d+:\\d+:\\d+)Z", "$1.000Z").as("ts_norm")),
    Some("""
      SELECT event_id,
             regexp_replace(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'),
                            '(\d+-\d+-\d+T\d+:\d+:\d+)Z', '\1.000Z') AS ts_norm
      FROM events
    """.trim)
  )

  /** F3+F4: UTC→KST shift + date/time split (jobs/etl_job.py:284-307).
    * from_utc_timestamp(_, Asia/Seoul) ≡ +9h (no DST since 1988). */
  val f3Timezone: Q = Q(
    "f3_f4_tz_split",
    (s, d) => {
      val kst = from_utc_timestamp(col("ts"), "Asia/Seoul")
      Tables.events(s, d).select(
        col("event_id"),
        date_format(kst, "yyyy-MM-dd").as("transaction_date"),
        date_format(kst, "HH:mm:ss").as("transaction_time"))
    },
    Some("""
      SELECT event_id,
             strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d') AS transaction_date,
             strftime(ts + INTERVAL 9 HOUR, '%H:%M:%S') AS transaction_time
      FROM events
    """.trim)
  )

  /** F5: the comma-scrub regex, char-eating behavior included
    * (jobs/etl_job.py:310-320), on a constructed comma-bearing string. */
  val f5Comma: Q = Q(
    "f5_remove_comma",
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"),
      regexp_replace(concat(col("lang"), lit(",,"), col("source"), lit(","), col("lang")),
        "[^\\\"](\\,+)|(\\,+)[^\\\"]", "").as("scrubbed")),
    Some("""
      SELECT doc_id,
             regexp_replace(lang || ',,' || source || ',' || lang,
                            '[^"](,+)|(,+)[^"]', '', 'g') AS scrubbed
      FROM documents
    """.trim)
  )

  /** F6: bracket/quote strip + split → array (jobs/etl_job.py:323-333)
    * on a constructed JSON-array-ish string. The array itself stays an
    * intermediate; the query surfaces scalar projections of it (size +
    * elements + re-joined form) because the driver's comparator cannot
    * sort array-typed result columns. */
  val f6Split: Q = Q(
    "f6_strip_split",
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"),
      split(
        regexp_replace(
          concat(lit("[\""), col("lang"), lit("\",\""), col("source"), lit("\"]")),
          "(^\\[)|(\\]$)|(\\\")", ""),
        ",").as("parts"))
      .select(
        col("doc_id"),
        size(col("parts")).as("n_parts"),
        element_at(col("parts"), 1).as("first_part"),
        element_at(col("parts"), -1).as("last_part"),
        array_join(col("parts"), "|").as("joined")),
    Some("""
      WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace('["' || lang || '","' || source || '"]',
                                           '(^\[)|(\]$)|(")', '', 'g'), ',') AS parts
        FROM documents)
      SELECT doc_id,
             len(parts) AS n_parts,
             parts[1] AS first_part,
             parts[-1] AS last_part,
             array_to_string(parts, '|') AS joined
      FROM t
    """.trim)
  )

  /** F7+F8: arrays_zip + explode (jobs/etl_job.py:336-350) over word
    * slices of the document text. */
  val f7Zip: Q = Q(
    "f7_f8_zip_explode",
    (s, d) => {
      val w = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"), slice(w, 1, 3).as("codes"), slice(w, 4, 3).as("names"))
        .withColumn("tmp", explode(arrays_zip(col("codes"), col("names"))))
        .select(col("doc_id"), col("tmp.codes").as("code"), col("tmp.names").as("name"))
    },
    Some("""
      SELECT doc_id, z[1] AS code, z[2] AS name FROM (
        SELECT doc_id, unnest(list_zip(w[1:3], w[4:6])) AS z
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ) t
    """.trim)
  )

  /** F8 proper: explode_outer's OUTER semantics under the oracle — rows
    * with null or empty arrays survive with a null element (reference
    * jobs/etl_job.py:336-350 relies on exactly this row-keeping). The
    * null/empty cases are synthesized by user_id residue so all three
    * branches (null array, empty array, 3-element array) appear. The
    * oracle expresses outer-unnest portably as inner-unnest ∪ the
    * null/empty rows null-padded. */
  val f8ExplodeOuter: Q = Q(
    "f8_explode_outer",
    (s, d) => {
      // k is extracted in its OWN projection: inlining the json path
      // twice into the when/split expression doubles the parse AND
      // produces one huge codegen method (sf1 measured 7x: the fused
      // form runs 13.5s vs 2.0s split like this; CollapseProject
      // correctly keeps the split because k is used twice)
      val withK = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), get_json_object(col("props"), "$.k").as("k"))
      val parts =
        when(pmod(col("user_id"), lit(7)) === 0, lit(null).cast("array<string>"))
          .when(pmod(col("user_id"), lit(7)) === 1, array().cast("array<string>"))
          .otherwise(split(concat(col("k"), lit("-"), col("event_type"),
            lit("-"), col("k")), "-"))
      withK
        .select(col("event_id"), parts.as("parts"))
        .select(col("event_id"), explode_outer(col("parts")).as("part"))
    },
    Some("""
      WITH t AS (
        SELECT event_id,
               CASE WHEN user_id % 7 = 0 THEN NULL
                    WHEN user_id % 7 = 1 THEN CAST([] AS VARCHAR[])
                    ELSE string_split(json_extract_string(props, '$.k') || '-' ||
                                      event_type || '-' ||
                                      json_extract_string(props, '$.k'), '-') END AS parts
        FROM events)
      SELECT event_id, unnest(parts) AS part
      FROM t WHERE parts IS NOT NULL AND len(parts) > 0
      UNION ALL
      SELECT event_id, CAST(NULL AS VARCHAR) AS part
      FROM t WHERE parts IS NULL OR len(parts) = 0
    """.trim)
  )

  /** F1 proper: json_tuple — the multi-key Generator the reference uses
    * for every site family (jobs/etl_job.py:175) — under the oracle.
    * Extracts an existing key and a missing one (null column) in one
    * generator call; the oracle replays it as two json_extract_string
    * projections. */
  val f1JsonTuple: Q = Q(
    "f1_json_tuple",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"), json_tuple(col("props"), "k", "missing"))
      .toDF("event_id", "k", "m"),
    Some("""
      SELECT event_id,
             json_extract_string(props, '$.k') AS k,
             json_extract_string(props, '$.missing') AS m
      FROM events
    """.trim)
  )

  /** F9: element_at(split, -1) — last path segment (jobs/etl_job.py:225). */
  val f9Last: Q = Q(
    "f9_element_at",
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"),
      element_at(split(col("text"), " "), -1).as("last_word")),
    Some("""
      SELECT doc_id, list_extract(string_split(text, ' '), -1) AS last_word
      FROM documents
    """.trim)
  )

  /** F10+P9: substring truncation (jobs/etl_job.py:423). */
  val f10Substr: Q = Q(
    "f10_substring",
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"), substring(col("text"), 1, 100).as("prefix")),
    Some("SELECT doc_id, substring(text, 1, 100) AS prefix FROM documents")
  )

  /** U1+U2: per-logtype select branches unioned (C1-C4 analogue,
    * jobs/etl_job.py:164-257). */
  val u1Union: Q = Q(
    "u1_union_branches",
    (s, d) => {
      val ev = Tables.events(s, d)
      val buy = ev.filter(col("event_type") === "purchase").select(
        col("event_id"), lit("buy").as("src"),
        get_json_object(col("props"), "$.k").as("code"))
      val view = ev.filter(col("event_type") === "view").select(
        col("event_id"), lit("view").as("src"),
        get_json_object(col("props"), "$.k").as("code"))
      buy.union(view)
    },
    Some("""
      SELECT event_id, 'buy' AS src, json_extract_string(props, '$.k') AS code
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_id, 'view' AS src, json_extract_string(props, '$.k') AS code
      FROM events WHERE event_type = 'view'
    """.trim)
  )

  /** J1+U4+A1: the C12+C13 shape — inner-join enrichment against a dim,
    * re-append the "login" rows null-padded, dedup
    * (jobs/etl_job.py:380-423,369-377). The dim (customer) is
    * broadcast: zero shuffle on the fact side. */
  val j1Enrich: Q = Q(
    "j1_u4_a1_enrich",
    (s, d) => {
      val ev = Tables.events(s, d)
      val cust = Tables.customer(s, d)
      val enriched = ev.filter(col("event_type") =!= "signup")
        .join(broadcast(cust), ev("user_id") === cust("c_custkey"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_mktsegment").as("segment"))
      val signup = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("event_type"),
          lit(null).cast(StringType).as("segment"))
      enriched.union(signup).dropDuplicates()
    },
    Some("""
      SELECT DISTINCT * FROM (
        SELECT event_id, user_id, event_type, c_mktsegment AS segment
        FROM events JOIN customer ON user_id = c_custkey
        WHERE event_type <> 'signup'
        UNION ALL
        SELECT event_id, user_id, event_type, CAST(NULL AS VARCHAR) AS segment
        FROM events WHERE event_type = 'signup'
      ) t
    """.trim)
  )

  /** A1: plain distinct on a projection (jobs/etl_job.py:369-377). */
  val a1Distinct: Q = Q(
    "a1_dropdup",
    (s, d) => Tables.events(s, d)
      .select(col("user_id"), col("event_type")).dropDuplicates(),
    Some("SELECT DISTINCT user_id, event_type FROM events")
  )

  /** A2+A3: aggregation — count + order-independent decimal sum/avg
    * (tests/test_etl_job.py:54-59). */
  val a2Stats: Q = Q(
    "a2_a3_agg_stats",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value")),
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type
    """.trim)
  )

  /** C1..C13 composed — the whole reference pipeline shape on events:
    * per-family JSON select branches ∪, timezone shift + date/time
    * split, null-userid fallback, broadcast inner-join enrichment with
    * the "login" (signup) rows re-appended null-padded, full dedup. */
  val cPipeline: Q = Q(
    "c1_c13_pipeline_events",
    (s, d) => {
      val ev = Tables.events(s, d)
      val k = get_json_object(col("props"), "$.k")
      // two "site families" keyed by user_id parity, different key dialects
      def branch(parity: Int, code: org.apache.spark.sql.Column) = ev
        .filter(col("event_type").isin("purchase", "view", "signup") &&
          pmod(col("user_id"), lit(2)) === parity)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          code.as("code"))
      val selected = branch(0, k).union(branch(1, concat(lit("b-"), k)))
      val kst = from_utc_timestamp(col("ts"), "Asia/Seoul")
      val shaped = selected.select(
        col("event_id"), col("user_id"), col("event_type"), col("code"),
        date_format(kst, "yyyy-MM-dd").as("transaction_date"),
        date_format(kst, "HH:mm:ss").as("transaction_time"),
        when(col("user_id") === 0L, concat(lit("anon-"), col("event_id").cast(StringType)))
          .otherwise(col("user_id").cast(StringType)).as("userid"))
      val cust = Tables.customer(s, d)
      val enriched = shaped.filter(col("event_type") =!= "signup")
        .join(broadcast(cust), shaped("user_id") === cust("c_custkey"))
        .select(col("userid"), col("transaction_date"), col("transaction_time"),
          col("event_type").as("log_type"), col("code"),
          col("c_mktsegment").as("segment"))
      val signup = shaped.filter(col("event_type") === "signup")
        .select(col("userid"), col("transaction_date"), col("transaction_time"),
          col("event_type").as("log_type"), col("code"),
          lit(null).cast(StringType).as("segment"))
      enriched.union(signup).dropDuplicates()
    },
    Some("""
      WITH sel AS (
        SELECT event_id, user_id, event_type, ts,
               json_extract_string(props, '$.k') AS code
        FROM events
        WHERE event_type IN ('purchase','view','signup') AND user_id % 2 = 0
        UNION ALL
        SELECT event_id, user_id, event_type, ts,
               'b-' || json_extract_string(props, '$.k') AS code
        FROM events
        WHERE event_type IN ('purchase','view','signup') AND user_id % 2 = 1
      ), shaped AS (
        SELECT event_id, user_id, event_type, code,
               strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d') AS transaction_date,
               strftime(ts + INTERVAL 9 HOUR, '%H:%M:%S') AS transaction_time,
               CASE WHEN user_id = 0 THEN 'anon-' || CAST(event_id AS VARCHAR)
                    ELSE CAST(user_id AS VARCHAR) END AS userid
        FROM sel
      )
      SELECT DISTINCT * FROM (
        SELECT userid, transaction_date, transaction_time,
               event_type AS log_type, code, c_mktsegment AS segment
        FROM shaped JOIN customer ON user_id = c_custkey
        WHERE event_type <> 'signup'
        UNION ALL
        SELECT userid, transaction_date, transaction_time,
               event_type AS log_type, code, CAST(NULL AS VARCHAR) AS segment
        FROM shaped WHERE event_type = 'signup'
      ) t
    """.trim)
  )

  /** U6: unpivot/melt — the four lineitem measures stacked into
    * (measure, value) rows; the oracle expresses the identical relation
    * as a stacked UNION ALL (the portable definition of UNPIVOT). */
  val u6Unpivot: Q = Q(
    "u6_unpivot",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value"),
    Some("""
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """.trim)
  )

  /** F12: string-function breadth on documents metadata — pads, case,
    * reverse, position, replace, repeat, edit distance. */
  val f12Strings: Q = Q(
    "f12_string_funcs",
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"),
      upper(col("lang")).as("up"),
      reverse(col("source")).as("rev"),
      lpad(col("lang"), 5, "_").as("padded"),
      regexp_replace(col("source"), "a", "@").as("replaced"),
      instr(col("source"), "a").as("pos_a"),
      repeat(col("lang"), 3).as("tripled"),
      levenshtein(col("lang"), col("source")).as("edit_dist"),
      ascii(col("lang")).as("first_code"),
      substring(col("source"), 2, 3).as("mid")),
    Some("""
      SELECT doc_id,
             upper(lang) AS up,
             reverse(source) AS rev,
             lpad(lang, 5, '_') AS padded,
             regexp_replace(source, 'a', '@', 'g') AS replaced,
             CAST(strpos(source, 'a') AS INT) AS pos_a,
             repeat(lang, 3) AS tripled,
             CAST(levenshtein(lang, source) AS INT) AS edit_dist,
             CAST(ascii(lang) AS INT) AS first_code,
             substring(source, 2, 3) AS mid
      FROM documents
    """.trim)
  )

  /** F13: datetime-function breadth on the event timestamps — field
    * extraction, truncation, month arithmetic, ISO weekday. Dates
    * surface as formatted strings for a type-stable compare. */
  val f13Datetime: Q = Q(
    "f13_datetime_funcs",
    (s, d) => Tables.events(s, d).select(
      col("event_id"),
      year(col("ts")).as("y"),
      month(col("ts")).as("m"),
      dayofmonth(col("ts")).as("dom"),
      hour(col("ts")).as("h"),
      minute(col("ts")).as("mi"),
      weekday(col("ts")).as("iso_wd"),
      dayofyear(col("ts")).as("doy"),
      date_format(date_trunc("month", col("ts")), "yyyy-MM-dd").as("month_start"),
      date_format(last_day(col("ts")), "yyyy-MM-dd").as("month_end"),
      date_format(add_months(col("ts"), 2), "yyyy-MM-dd").as("plus2m")),
    Some("""
      SELECT event_id,
             CAST(year(ts) AS INT) AS y,
             CAST(month(ts) AS INT) AS m,
             CAST(day(ts) AS INT) AS dom,
             CAST(hour(ts) AS INT) AS h,
             CAST(minute(ts) AS INT) AS mi,
             CAST(isodow(ts) - 1 AS INT) AS iso_wd,
             CAST(dayofyear(ts) AS INT) AS doy,
             strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_start,
             strftime(last_day(ts), '%Y-%m-%d') AS month_end,
             strftime(CAST(ts AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m
      FROM events
    """.trim)
  )

  def all: Seq[Q] = Seq(p1Project, p3Filter, p4Fallback, f1JsonTuple, f2Regex,
    f3Timezone, f5Comma, f6Split, f7Zip, f8ExplodeOuter, f9Last, f10Substr,
    f12Strings, f13Datetime, u1Union, u6Unpivot, j1Enrich, a1Distinct, a2Stats,
    cPipeline)
}
