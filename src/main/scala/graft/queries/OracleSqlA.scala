package graft.queries

import QueryHelpers._
import OracleSqlDefs._

/** One half of the [[graft.SparkEntry.oracleSql]] registry (mechanical
  * split; entries verbatim, alphabetic order preserved within each
  * half).
  */
private[graft] object OracleSqlA {

  def map: Map[String, String] = Map(
    "gopher_repetition_flags" -> gopherRepetitionSql,
    "quality_logit" -> qualityLogitSql,
    "quality_calibrated" ->
      // the full logit oracle as a subquery, percent-ranked per source
      s"""SELECT d.doc_id, d.source, q.quality_score,
         |  percent_rank() OVER (PARTITION BY d.source
         |    ORDER BY q.quality_score) AS calibrated
         |FROM ($qualityLogitSql) q
         |JOIN documents d ON d.doc_id = q.doc_id""".stripMargin,
    "dedup_keep_best" -> dedupKeepBestSql(),
    "dedup_keep_best_capped" -> dedupKeepBestSql(Some(64)),
    "c4_page_filter" ->
      // same in-plan page derivation as the Spark query (12-token
      // lines, '.' on even docs, the three injected rule-trigger
      // lines), then the C4 line+page rules in builtin string
      // arithmetic — 1-based inclusive list slices, single-space word
      // split, strpos/right instead of regex, replace-delta sentence
      // counts
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |paged AS (SELECT doc_id,
        |  array_to_string(
        |    [array_to_string(t[(i-1)*12+1:(i-1)*12+12], ' ')
        |       || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END
        |     for i in range(1, CAST(ceil(len(t) / 12.0) AS BIGINT) + 1)]
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN ['see the javascript console output.']
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ['lorem ipsum dolor sit amet.']
        |         ELSE CAST([] AS VARCHAR[]) END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ['function demo() {']
        |         ELSE CAST([] AS VARCHAR[]) END,
        |    chr(10)) AS page
        |  FROM base),
        |ln AS (SELECT doc_id, page, string_split(page, chr(10)) AS ls FROM paged),
        |k AS (SELECT doc_id, page, ls,
        |  list_filter(ls, l -> right(l, 1) IN ('.', '!', '?', '"', '''')
        |    AND len(string_split(l, ' ')) >= 3
        |    AND strpos(lower(l), 'javascript') = 0) AS ka
        |  FROM ln),
        |c AS (SELECT doc_id, page, ls, ka,
        |  COALESCE(array_to_string(ka, chr(10)), '') AS clean_text FROM k),
        |m AS (SELECT doc_id,
        |  len(ls) AS n_lines,
        |  len(ka) AS n_kept_lines,
        |  clean_text,
        |  (length(clean_text) - length(replace(clean_text, '.', '')))
        |   + (length(clean_text) - length(replace(clean_text, '!', '')))
        |   + (length(clean_text) - length(replace(clean_text, '?', ''))) AS n_sentences,
        |  strpos(lower(page), 'lorem ipsum') > 0 AS has_lorem_ipsum,
        |  strpos(page, '{') > 0 AS has_brace
        |  FROM c)
        |SELECT doc_id, n_lines, n_kept_lines, clean_text, n_sentences,
        |  has_lorem_ipsum, has_brace,
        |  n_sentences >= 5 AS flag_sentences,
        |  n_sentences >= 5 AND NOT has_lorem_ipsum AND NOT has_brace AS keep
        |FROM m""".stripMargin,
    "corpus_report" -> corpusReportSql,
    "kmeans_profile_portable" -> kmeansPortableOracleSql,
    "d4_prototype_prune_portable" -> d4PortableOracleSql,
    "semantic_prune_portable" -> semanticPrunePortableOracleSql,
    "ann_ivf_topk_portable" -> annIvfPortableOracleSql,
    "semantic_contamination_portable" -> semanticContaminationPortableOracleSql,
    "pq_adc_portable" -> pqAdcPortableOracleSql,
    "pca_power_portable" -> pcaPowerPortableOracleSql,
    // the exact integer moment pass: quantized products sum exactly as
    // longs in both engines (micro-unit trick, bilinear form)
    "pca_gram" ->
      """WITH q AS (SELECT
        |  [CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |   FOR x IN embedding] AS qv FROM embeddings),
        |c AS (SELECT COUNT(*) AS n_rows FROM q)
        |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |  CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS qsum,
        |  CAST(MAX(n_rows) AS BIGINT) AS n_rows
        |FROM q, range(1, 65) t1(i), range(1, 65) t2(j), c
        |WHERE j >= i
        |GROUP BY i, j""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order,
        | CAST(CAST(SUM(l_quantity) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        | AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        | CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        | AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount BETWEEN 0.05 AND 0.07
        | AND l_quantity < 24""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderstatus""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q_window_top3" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) WHERE rn <= 3""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_intersect_custs" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT SELECT o_custkey AS custkey FROM orders""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.5) AS median_price,
        | quantile_cont(l_extendedprice, 0.95) AS p95_price,
        | quantile_cont(l_quantity, 0.5) AS median_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_sql_correlated" ->
      """SELECT c_custkey, c_mktsegment,
        | (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        | (SELECT CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
        |   FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
        |FROM customer c""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,
    "q_moving_spend" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS trailing_30d_spend
        |FROM orders""".stripMargin,
    "q_pivot_events" ->
      """SELECT user_id,
        | COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        | COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
        | COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        | COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        | COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
        |FROM events GROUP BY user_id""".stripMargin,
    "q_except_custs" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000""".stripMargin,
    "q_agg_gate" ->
      """SELECT COUNT(*) AS n_rows, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM lineitem""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS event_hour, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_json" ->
      // the outer CAST matters: DuckDB's SUM(BIGINT) widens to HUGEINT
      // (int128) and the driver's hash compare is dtype-sensitive
      """SELECT event_type,
        | CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        | COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS INT)
        |   AS days_since_prev,
        | LAG(o_orderkey) OVER w AS prev_orderkey,
        | LEAD(o_orderkey) OVER w AS next_orderkey
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "q_cond_agg" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        | COUNT(*) AS n_all,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |   THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS spend_f,
        | COUNT(DISTINCT o_custkey) AS n_custs
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(LEAST(GREATEST(FLOOR(
        |   (CAST(l_extendedprice AS DOUBLE) - 900.0) / 5205.0), 0.0), 19.0)
        |   AS BIGINT) AS bucket,
        | COUNT(*) AS n,
        | MIN(CAST(l_extendedprice AS DOUBLE)) AS lo,
        | MAX(CAST(l_extendedprice AS DOUBLE)) AS hi
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_rank_stats" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(NTILE(4) OVER w AS INT) AS quartile,
        | PERCENT_RANK() OVER w AS pct_rank,
        | CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "q_range_join" ->
      """WITH inc AS (SELECT event_id AS incident_id, ts AS w_start,
        |  ts + INTERVAL 1 HOUR AS w_end FROM events WHERE event_type = 'error')
        |SELECT incident_id, COUNT(*) AS n_events,
        | COUNT(DISTINCT e.user_id) AS n_users
        |FROM inc JOIN events e ON e.ts >= inc.w_start AND e.ts < inc.w_end
        |GROUP BY incident_id""".stripMargin,
    "q_asof_join" ->
      """WITH r AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS ok,
        |  arg_max(o_totalprice, o_orderkey) AS op
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, e.ts,
        | r.ok AS last_orderkey, r.op AS last_totalprice
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate""".stripMargin,
    "q_sessions" ->
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, ts,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > CAST(3600 AS BIGINT) * 1000000
        |       THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts,
        |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM m)
        |SELECT user_id, session_idx, MIN(ts) AS session_start,
        | MAX(ts) AS session_end, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "q_session_cooccurrence" ->
      """WITH e AS (SELECT user_id, ts, event_type,
        |  epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, ts, event_type,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > CAST(3600 AS BIGINT) * 1000000
        |       THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, event_type,
        |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM m),
        |p AS (SELECT DISTINCT user_id, session_idx, event_type FROM s),
        |sup AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM p GROUP BY 1),
        |pr AS (SELECT a.event_type AS kind_a, b.event_type AS kind_b,
        |  CAST(count(*) AS BIGINT) AS n_both
        |  FROM p a JOIN p b ON a.user_id = b.user_id
        |    AND a.session_idx = b.session_idx
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT pr.kind_a, pr.kind_b, pr.n_both,
        |  sa.n_sessions AS n_a, sb.n_sessions AS n_b
        |FROM pr
        |JOIN sup sa ON sa.event_type = pr.kind_a
        |JOIN sup sb ON sb.event_type = pr.kind_b""".stripMargin,
    // greedy-earliest funnel: t1 = min view; t_i = min step-i event
    // strictly after t_{i-1}; left joins keep partial completions
    "q_funnel_users" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3 FROM s1
        |LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,
    "q_funnel_windowed" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 21600 SECOND GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t2 + INTERVAL 21600 SECOND GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3 FROM s1
        |LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,
    "q_funnel_reach" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT 1 AS step_idx, 'view' AS step, COUNT(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', COUNT(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(*) FROM s3""".stripMargin,
    "q_retention_cohorts" ->
      """WITH f AS (SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS period
        |  FROM events)
        |-- DuckDB date_trunc('day') yields DATE; Spark's yields TIMESTAMP
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
        | CAST(datediff('day', cohort, period) AS INTEGER) AS offset_n,
        | COUNT(*) AS n_active
        |FROM a JOIN f USING (user_id)
        |WHERE datediff('day', cohort, period) <= 7
        |GROUP BY 1, 2""".stripMargin,
    // gaps-and-islands: change flags -> running island id -> one row per
    // run, valid_to = next run's start (half-open, null for the open run)
    "q_scd2_history" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type
        |       THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM m),
        |g AS (SELECT user_id, island, event_type AS value,
        |  MIN(ts) AS valid_from, COUNT(*) AS n_events
        |  FROM i GROUP BY 1, 2, 3)
        |SELECT user_id, value, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) AS valid_to,
        | n_events
        |FROM g""".stripMargin,
    "flatten_struct" ->
      """SELECT o_orderkey, o_orderstatus AS ord_status, o_totalprice AS ord_price
        |FROM orders""".stripMargin,
    "flatten_prefix" ->
      """SELECT o_orderkey, o_orderstatus AS f_status, o_orderpriority AS f_priority
        |FROM orders""".stripMargin,
    "flatten_all_nested" ->
      """SELECT c_custkey, c_name AS cust_info_name, c_mktsegment AS cust_info_seg
        |FROM customer""".stripMargin,
    "explode_carry" ->
      """SELECT p_partkey, p_brand AS attr FROM part
        |UNION ALL SELECT p_partkey, p_type AS attr FROM part""".stripMargin,
    "explode_pos" ->
      """SELECT p_partkey, CAST(0 AS INT) AS attr_idx, p_brand AS attr FROM part
        |UNION ALL
        |SELECT p_partkey, CAST(1 AS INT) AS attr_idx, p_type AS attr FROM part""".stripMargin,
    "explode_map_label" ->
      """SELECT 'suppliers' AS "key", s_name AS "value" FROM supplier""".stripMargin,
    "explode_chain" ->
      """SELECT r_name, n_name, c_custkey, c_name
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        | JOIN customer ON c_nationkey = n_nationkey""".stripMargin,
    "timestamps_multi" ->
      """SELECT o_orderkey,
        | o_orderdate AS t_zulu,
        | o_orderdate AS t_nozone,
        | o_orderdate + INTERVAL 123456 MICROSECOND AS t_nanos,
        | o_orderdate AS t_millis,
        | o_orderdate AS t_epoch,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders""".stripMargin,
    "sqbrackets_logs" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 10 = 0 THEN '' ELSE 'I' END AS head,
        | CASE WHEN o_orderkey % 10 = 0 THEN '' ELSE '2024-01-01 00:00:00.000' END AS ts,
        | CASE WHEN o_orderkey % 10 = 0 THEN '' ELSE 'JupyterHub' END AS service,
        | CASE WHEN o_orderkey % 10 = 0 THEN '' ELSE 'app' END AS typ,
        | CASE WHEN o_orderkey % 10 = 0 THEN '' ELSE CAST(o_orderkey AS VARCHAR) END AS code,
        | CASE WHEN o_orderkey % 10 = 0 THEN 'plain line ' || o_orderpriority
        |      ELSE 'msg ' || o_orderpriority END AS msg
        |FROM orders""".stripMargin,
    "jhub_pipeline_transform" ->
      """SELECT o_orderdate AS time_stamp,
        | 'hub-' || CAST(o_orderkey % 3 AS VARCHAR) AS kuber_container_name,
        | 'node' || CAST(o_custkey % 5 AS VARCHAR) AS kuber_host,
        | 'pod-' || CAST(o_orderkey AS VARCHAR) AS kuber_pod_name,
        | 'I' AS log_head,
        | TIMESTAMP '2024-01-01 00:00:00' AS log_timestamp,
        | 'JupyterHub' AS log_service,
        | 'app' AS log_type,
        | CAST(o_orderkey AS VARCHAR) AS log_code,
        | 'served ' || o_orderpriority AS log_msg
        |FROM orders""".stripMargin,
    "zoom_meetings_transform" ->
      """SELECT 'acct' || CAST(o_custkey % 7 AS VARCHAR) AS meet_account_id,
        | o_orderkey % 120 AS meet_duration,
        | 'host' || CAST(o_custkey AS VARCHAR) || '@x.io' AS meet_host_email,
        | 'h' || CAST(o_custkey AS VARCHAR) AS meet_host_id,
        | o_orderkey AS meet_id,
        | o_orderkey % 4 AS meet_recording_count,
        | 'https://share/' || CAST(o_orderkey AS VARCHAR) AS meet_share_url,
        | o_orderdate AS meet_start_time,
        | 'UTC' AS meet_timezone,
        | 'Topic ' || o_orderpriority AS meet_topic,
        | o_orderkey * 1000 AS meet_total_size,
        | CAST(2 AS BIGINT) AS meet_type,
        | 'uuid-' || CAST(o_orderkey AS VARCHAR) AS meet_uuid
        |FROM orders""".stripMargin,
    "contract_select" ->
      """SELECT c_custkey AS customer_id, c_name AS customer_name,
        | c_mktsegment AS segment, 'graft' AS load_src FROM customer""".stripMargin,
    "concat_ws_csv" ->
      """SELECT c_custkey, c_name || ',' || c_mktsegment AS csv FROM customer""".stripMargin,
    "corpus_pack" ->
      // exclusive prefix sum of token counts per source, chunked into
      // 512-token windows; DuckDB windowed SUM(BIGINT) widens to HUGEINT,
      // hence the explicit cast before the subtraction. cum // 512 is
      // BIGINT floor division of non-negatives — matches Spark's `div`
      // exactly at all magnitudes
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS cum FROM t)
        |SELECT doc_id, source, n_tokens,
        | cum // 512 AS pack_id,
        | cum % 512 AS pack_offset
        |FROM c""".stripMargin,
    // the two-level scan must reproduce the single-window assignments
    // bit-for-bit, so it is held to the IDENTICAL oracle
    "corpus_pack_chunked" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS cum FROM t)
        |SELECT doc_id, source, n_tokens,
        | cum // 512 AS pack_id,
        | cum % 512 AS pack_offset
        |FROM c""".stripMargin,
    "corpus_mixture" ->
      // FLOOR(sqrt·1e6+0.5) micro-units as exact BIGINT — all-integral
      // projection so the hash gate has no float cell to disagree on
      // (r7: the weight double was value-identical yet hash-red)
      // the outer CAST matters: DuckDB widens SUM(BIGINT) to HUGEINT and
      // the driver hashes typed cells, so an uncast sum hash-mismatches
      // Spark's int64 even when every value is identical (red r7+r8)
      """WITH c AS (SELECT source,
        |  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_units
        |  FROM documents GROUP BY source)
        |SELECT source, n_units,
        |  CAST(FLOOR(sqrt(CAST(n_units AS DOUBLE)) * 1000000.0 + 0.5)
        |    AS BIGINT) AS q_units
        |FROM c""".stripMargin,
    "corpus_budget_alloc" ->
      // mirror of the closed-form water-filling: identical exact-long
      // inputs, one IEEE division for λ, min(cap, floor(λ·q)) per row —
      // bit-identical in any IEEE engine. NULL λ (budget above all
      // caps) degrades to the caps in both.
      // same HUGEINT rule as corpus_mixture: cast the SUM back to BIGINT
      """WITH c AS (SELECT source,
        |  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_units
        |  FROM documents GROUP BY source),
        |q AS (SELECT source, n_units,
        |  CAST(FLOOR(sqrt(CAST(n_units AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q_units
        |  FROM c),
        |caps AS (SELECT source, n_units, q_units,
        |  CAST(FLOOR(CAST(n_units AS DOUBLE) * 2.0) AS BIGINT) AS cap_tokens,
        |  CAST(cap_tokens AS DOUBLE) / CAST(q_units AS DOUBLE) AS rr
        |  FROM q),
        |sums AS (SELECT *,
        |  SUM(cap_tokens) OVER (ORDER BY rr, source ROWS UNBOUNDED PRECEDING) AS cumC,
        |  SUM(q_units) OVER (ORDER BY rr, source ROWS UNBOUNDED PRECEDING) AS cumQ,
        |  SUM(q_units) OVER () AS totQ
        |  FROM caps WHERE q_units > 0),
        |cand AS (SELECT *,
        |  LAG(cumC, 1, 0) OVER (ORDER BY rr, source) AS cPrev,
        |  LAG(cumQ, 1, 0) OVER (ORDER BY rr, source) AS qPrev,
        |  LAG(rr, 1, 0.0) OVER (ORDER BY rr, source) AS rPrev
        |  FROM sums),
        |lamv AS (SELECT MIN(lam) AS lambda FROM (
        |  SELECT (52000.0 - CAST(cPrev AS DOUBLE)) / CAST(totQ - qPrev AS DOUBLE) AS lam,
        |         rr, rPrev FROM cand)
        |  WHERE lam >= rPrev AND lam <= rr)
        |SELECT source, n_units, q_units, cap_tokens,
        |  CASE WHEN q_units > 0 THEN
        |    LEAST(cap_tokens, CAST(COALESCE(
        |      FLOOR(l.lambda * CAST(q_units AS DOUBLE)), cap_tokens) AS BIGINT))
        |  ELSE 0 END AS alloc_tokens
        |FROM caps, lamv l""".stripMargin,
    "corpus_fixed_sample" ->
      // lowercase md5 hex compares identically in both engines (the
      // corpus_split portability argument), doc_id breaks exact-key ties
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 5""".stripMargin,
    "corpus_weighted_sample" ->
      // systematic PPS cuts: pure integer arithmetic (// is DuckDB
      // integer division, div on the Spark side); the random start u0
      // is 60 md5 bits mod the stratum total — cum/tot widen to
      // HUGEINT internally but are never projected
      """SELECT doc_id, lang, weight FROM (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
        |    SUM(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang
        |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang) AS tot,
        |    1 + (('0x' || substr(md5('graft#' || lang), 1, 15))::BIGINT %
        |         SUM(CAST(n_chars AS BIGINT)) OVER (PARTITION BY lang)) AS u0
        |  FROM documents)
        |WHERE (5 * cum - u0 + tot) // tot >
        |      (5 * (cum - weight) - u0 + tot) // tot""".stripMargin,
    "corpus_length_buckets" ->
      // quantile_cont == Spark's exact interpolated percentile (the
      // q_percentiles equivalence), so the cut points are bit-identical
      """WITH c AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE),
        |                  [0.25, 0.5, 0.75]) AS cuts FROM documents)
        |SELECT doc_id, n_chars,
        | CAST(CASE WHEN CAST(n_chars AS DOUBLE) <= cuts[1] THEN 1
        |      WHEN CAST(n_chars AS DOUBLE) <= cuts[2] THEN 2
        |      WHEN CAST(n_chars AS DOUBLE) <= cuts[3] THEN 3
        |      ELSE 4 END AS INT) AS bucket
        |FROM documents CROSS JOIN c""".stripMargin,
    "corpus_fluency_buckets" ->
      // unigram mean_freq CTE (the doc_unigram_stats oracle) bucketed by
      // quantile_cont cuts — both halves reuse proven-bit-identical forms
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |cf AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        |stats AS (SELECT doc_id,
        |  CAST(SUM(tf * cf) AS DOUBLE) / CAST(SUM(tf) AS BIGINT) AS mean_freq
        |  FROM tf JOIN cf USING (token) GROUP BY doc_id),
        |c AS (SELECT quantile_cont(mean_freq, [0.25, 0.5, 0.75]) AS cuts
        |  FROM stats)
        |SELECT doc_id, mean_freq,
        | CAST(CASE WHEN mean_freq <= cuts[1] THEN 1
        |      WHEN mean_freq <= cuts[2] THEN 2
        |      WHEN mean_freq <= cuts[3] THEN 3
        |      ELSE 4 END AS INT) AS fluency_bucket
        |FROM stats CROSS JOIN c""".stripMargin,
    "chunk_documents" ->
      // same start set as Spark's sequence(0, len-1, stride): inclusive
      // bounds, fixed step; substr is 1-based char semantics both sides
      """WITH starts AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, CAST(length(text) - 1 AS BIGINT), 120)) AS s
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |  CAST(s // 120 AS INT) AS chunk_idx,
        |  CAST(s AS INT) AS chunk_start,
        |  substr(text, CAST(s AS INT) + 1, 200) AS chunk_text,
        |  CAST(length(substr(text, CAST(s AS INT) + 1, 200)) AS INT) AS chunk_chars
        |FROM starts""".stripMargin,
    "chunk_tokens" ->
      // DuckDB list slice t[a:b] is 1-based inclusive; stop clamps at
      // len(t) to match Spark's slice(length) bound
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |starts AS (SELECT doc_id, t,
        |    unnest(generate_series(0, CAST(len(t) - 1 AS BIGINT), 30)) AS s
        |  FROM toks WHERE len(t) > 0)
        |SELECT doc_id,
        |  CAST(s // 30 AS INT) AS chunk_idx,
        |  CAST(s AS INT) AS tok_start,
        |  array_to_string(t[CAST(s + 1 AS INT) :
        |                    CAST(least(s + 40, len(t)) AS INT)], ' ') AS chunk_text,
        |  CAST(least(s + 40, len(t)) - s AS INT) AS chunk_tokens
        |FROM starts""".stripMargin,
    "chunk_stats" ->
      """WITH starts AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, CAST(length(text) - 1 AS BIGINT), 120)) AS s
        |  FROM documents WHERE length(text) > 0),
        |ch AS (SELECT doc_id, CAST(s AS INT) AS cs,
        |         length(substr(text, CAST(s AS INT) + 1, 200)) AS cc
        |       FROM starts)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(cc) AS BIGINT) AS chunked_chars,
        |  CAST(MAX(cs + cc) AS INT) AS covered_to
        |FROM ch GROUP BY doc_id""".stripMargin,
    "bpe_pair_counts" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT t, unnest(generate_series(1, CAST(len(t) - 1 AS BIGINT))) AS i
        |        FROM toks WHERE len(t) >= 2)
        |SELECT t[i] AS a, t[i + 1] AS b, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM idx GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 40""".stripMargin,
    "bpe_encode_portable" -> bpeEncodePortableOracle,
    "corpus_split" ->
      """SELECT doc_id,
        | CASE WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4)
        |        < 'e666' THEN 'train' ELSE 'holdout' END AS split
        |FROM documents""".stripMargin,
    "corpus_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (lang = 'en' AND
        |        substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
        |   OR (lang = 'de' AND
        |        substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) < 'g')""".stripMargin,
    "group_safe_split_clusters" ->
      // the dedup_clusters reach-CTE verbatim, then the md5 split
      // keyed on the component label
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT id_a, id_b FROM inter
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) >= 0.5),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, comp) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT e.t, r.comp FROM reach r JOIN edges e ON e.s = r.id),
        |lab AS (SELECT d.doc_id, COALESCE(MIN(r.comp), d.doc_id) AS component
        |  FROM documents d LEFT JOIN reach r ON r.id = d.doc_id
        |  GROUP BY d.doc_id)
        |SELECT doc_id, component,
        |  CASE WHEN substr(md5('graft' || CAST(component AS VARCHAR)), 1, 4)
        |       < 'e666' THEN 'train' ELSE 'holdout' END AS split
        |FROM lab""".stripMargin,
    "group_safe_split" ->
      """SELECT doc_id,
        | CASE WHEN substr(md5('graft' || text), 1, 4) < 'e666'
        |      THEN 'train' ELSE 'holdout' END AS split
        |FROM documents""".stripMargin,
    "split_leakage" ->
      """WITH sp AS (SELECT doc_id, text,
        |  CASE WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4)
        |         < 'e666' THEN 'train' ELSE 'holdout' END AS split
        |  FROM documents)
        |SELECT text AS leak_key,
        |  CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN split = 'holdout' THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout,
        |  MIN(CASE WHEN split = 'train' THEN doc_id END) AS train_id,
        |  MIN(CASE WHEN split = 'holdout' THEN doc_id END) AS holdout_id
        |FROM sp GROUP BY text
        |HAVING SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) > 0
        |   AND SUM(CASE WHEN split = 'holdout' THEN 1 ELSE 0 END) > 0""".stripMargin,
    // hash-range sharding: shard = #boundaries (i*4096 as 4-hex) at or
    // below the 4-hex md5 key — contiguous key slices, not hash-mod
    "corpus_shards" ->
      """WITH k AS (SELECT doc_id,
        |  substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) AS shard_key
        |  FROM documents)
        |SELECT doc_id, shard_key,
        |  (CASE WHEN shard_key >= '1000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '2000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '3000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '4000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '5000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '6000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '7000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '8000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '9000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'a000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'b000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'c000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'd000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'e000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'f000' THEN 1 ELSE 0 END) AS shard
        |FROM k""".stripMargin,
    "shard_stats" ->
      """WITH k AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
        |  substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4) AS shard_key
        |  FROM documents),
        |s AS (SELECT doc_id, n_toks, shard_key,
        |  (CASE WHEN shard_key >= '1000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '2000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '3000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '4000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '5000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '6000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '7000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '8000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= '9000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'a000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'b000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'c000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'd000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'e000' THEN 1 ELSE 0 END
        | + CASE WHEN shard_key >= 'f000' THEN 1 ELSE 0 END) AS shard
        |FROM k)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |  MIN(shard_key) AS min_key, MAX(shard_key) AS max_key
        |FROM s GROUP BY shard""".stripMargin,
    // Gopher A1.1 rules: every measurement is integer counts + one IEEE
    // division, so flags and ratios are engine-exact; '...' occurrences
    // via the non-overlapping replace-delta // 3 (delta is always a
    // multiple of 3, so integer division is exact on both sides)
    "gopher_quality_flags" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(toks) AS n_words,
        |    CAST(length(text) - (len(toks) - 1) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS mean_word_len,
        |    CAST((length(text) - length(replace(text, '#', '')))
        |       + (length(text) - length(replace(text, '...', ''))) // 3
        |       + (length(text) - length(replace(text, '…', ''))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS alpha_frac,
        |    CAST(len(list_filter(toks,
        |      x -> x IN ('the','be','to','of','and','that','have','with'))) AS INT) AS n_stop
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))
        |SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
        |  symbol_ratio, alpha_frac, n_stop,
        |  n_words BETWEEN 50 AND 100000 AS flag_words,
        |  mean_word_len BETWEEN 3.0 AND 10.0 AS flag_word_len,
        |  symbol_ratio <= 0.1 AS flag_symbols,
        |  alpha_frac >= 0.8 AS flag_alpha,
        |  n_stop >= 2 AS flag_stopwords,
        |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND n_stop >= 2 AS keep
        |FROM f""".stripMargin,
    "gopher_drop_histogram" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(toks) AS n_words,
        |    CAST(length(text) - (len(toks) - 1) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS mean_word_len,
        |    CAST((length(text) - length(replace(text, '#', '')))
        |       + (length(text) - length(replace(text, '...', ''))) // 3
        |       + (length(text) - length(replace(text, '…', ''))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE) AS alpha_frac,
        |    len(list_filter(toks,
        |      x -> x IN ('the','be','to','of','and','that','have','with'))) AS n_stop
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)),
        |g AS (SELECT
        |    n_words BETWEEN 50 AND 100000 AS flag_words,
        |    mean_word_len BETWEEN 3.0 AND 10.0 AS flag_word_len,
        |    symbol_ratio <= 0.1 AS flag_symbols,
        |    alpha_frac >= 0.8 AS flag_alpha,
        |    n_stop >= 2 AS flag_stopwords
        |  FROM f)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN flag_words AND flag_word_len AND flag_symbols
        |    AND flag_alpha AND flag_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(SUM(CASE WHEN NOT flag_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
        |  CAST(SUM(CASE WHEN NOT flag_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_len,
        |  CAST(SUM(CASE WHEN NOT flag_symbols THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbols,
        |  CAST(SUM(CASE WHEN NOT flag_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
        |  CAST(SUM(CASE WHEN NOT flag_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords
        |FROM g""".stripMargin,
    "ngram_counts" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id,
        |  unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS gram
        |  FROM toks WHERE len(t) >= 3)
        |SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM g GROUP BY gram HAVING COUNT(*) >= 2
        |ORDER BY cnt DESC, gram LIMIT 100""".stripMargin,
    "dedup_exact" ->
      """SELECT text AS dedup_key, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
        |FROM documents GROUP BY text""".stripMargin,
    "dedup_dup_ids" ->
      """SELECT d.doc_id AS row_id, k.keep_id
        |FROM documents d JOIN (
        |  SELECT lang, MIN(doc_id) AS keep_id FROM documents GROUP BY lang) k
        | ON d.lang = k.lang
        |WHERE d.doc_id <> k.keep_id""".stripMargin,
    // The portable incremental-dedup funnel, mirrored stage for stage:
    // annotate/gate = the text_stats formulas + filters; exact self-dedup
    // = min-id QUALIFY; signatures = min md5-hex per (doc, k); band keys
    // = raw 4-element signature slices; est_jaccard = agree/64 (exact
    // dyadic division, so the >= 0.7 cut is engine-identical)
    "dedup_incremental_portable" ->
      """WITH ann AS (
        |  SELECT doc_id, text, source, n_tokens,
        |    CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'de'
        |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'fr'
        |         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'es'
        |         ELSE 'ru' END AS lang_pred,
        |    (least(CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE))
        |     + CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END
        |     + least(CAST(n_tokens AS DOUBLE) / 20.0, CAST(1.0 AS DOUBLE))) / 3.0 AS quality
        |  FROM (
        |    SELECT doc_id, text, source,
        |      len(toks) AS n_tokens,
        |      CAST(length(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len,
        |      len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS n_stopwords,
        |      len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |      len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
        |      len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS s_fr,
        |      len(list_filter(toks, x -> x IN ('el','los','las','es','y'))) AS s_es,
        |      len(list_filter(toks, x -> x IN ('и','в','не','на','что'))) AS s_ru
        |    FROM (SELECT doc_id, text, source, string_split(text, ' ') AS toks
        |          FROM documents WHERE doc_id % 5 = 0))),
        |refg AS (SELECT doc_id, text FROM ann
        |  WHERE regexp_matches(source, '^src[0-9]$')
        |    AND n_tokens >= 5 AND quality >= 0.3 AND lang_pred = 'en'),
        |incg AS (SELECT doc_id, text, lang_pred, n_tokens FROM ann
        |  WHERE regexp_matches(source, '^src1[0-9]$')
        |    AND n_tokens >= 5 AND quality >= 0.3 AND lang_pred = 'en'),
        |iexact AS (SELECT doc_id, text, lang_pred, n_tokens FROM incg
        |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)),
        |rsh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM refg) WHERE len(t) >= 3)),
        |ish AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM iexact) WHERE len(t) >= 3)),
        |rsig AS (SELECT doc_id, LIST(h ORDER BY k) AS sig FROM (
        |  SELECT doc_id, k, MIN(substr(md5(sh || ':' || CAST(k AS VARCHAR)), 1, 16)) AS h
        |  FROM rsh CROSS JOIN range(64) r(k) GROUP BY doc_id, k) GROUP BY doc_id),
        |isig AS (SELECT doc_id, LIST(h ORDER BY k) AS sig FROM (
        |  SELECT doc_id, k, MIN(substr(md5(sh || ':' || CAST(k AS VARCHAR)), 1, 16)) AS h
        |  FROM ish CROSS JOIN range(64) r(k) GROUP BY doc_id, k) GROUP BY doc_id),
        |rbands AS (SELECT doc_id, b AS band_idx,
        |    array_to_string(sig[b*4+1 : b*4+4], ',') AS band_key
        |  FROM rsig CROSS JOIN range(16) rb(b)),
        |ibands AS (SELECT doc_id, b AS band_idx,
        |    array_to_string(sig[b*4+1 : b*4+4], ',') AS band_key
        |  FROM isig CROSS JOIN range(16) rb(b)),
        |scand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ibands a JOIN ibands b ON a.band_idx = b.band_idx
        |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |sdrops AS (SELECT DISTINCT id_b FROM scand
        |  JOIN isig sa ON sa.doc_id = id_a JOIN isig sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
        |        / CAST(len(sa.sig) AS DOUBLE) >= 0.7),
        |sclean AS (SELECT doc_id, lang_pred, n_tokens FROM iexact
        |  WHERE NOT EXISTS (SELECT 1 FROM sdrops WHERE id_b = doc_id)),
        |ccand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM rbands a JOIN ibands b ON a.band_idx = b.band_idx
        |    AND a.band_key = b.band_key AND a.doc_id <> b.doc_id
        |  WHERE EXISTS (SELECT 1 FROM sclean WHERE sclean.doc_id = b.doc_id)),
        |cdrops AS (SELECT DISTINCT id_b FROM ccand
        |  JOIN rsig sa ON sa.doc_id = id_a JOIN isig sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
        |        / CAST(len(sa.sig) AS DOUBLE) >= 0.7)
        |SELECT doc_id, lang_pred, n_tokens FROM sclean
        |WHERE NOT EXISTS (SELECT 1 FROM cdrops WHERE id_b = doc_id)""".stripMargin,
    // End-to-end portable curation funnel: the ann/gate/exact/LSH
    // fragments proven on dedup_incremental_portable, the md5 simhash
    // votes from simhash_codes_portable, and the k=5/w=4 winnow-count
    // variant of the boilerplate fingerprint machinery
    "corpus_curation_portable" ->
      """WITH ann AS (
        |  SELECT doc_id, text, n_tokens,
        |    CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'de'
        |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'fr'
        |         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'es'
        |         ELSE 'ru' END AS lang_pred,
        |    (least(CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE))
        |     + CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END
        |     + least(CAST(n_tokens AS DOUBLE) / 20.0, CAST(1.0 AS DOUBLE))) / 3.0 AS quality
        |  FROM (
        |    SELECT doc_id, text,
        |      len(toks) AS n_tokens,
        |      CAST(length(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len,
        |      len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS n_stopwords,
        |      len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |      len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
        |      len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS s_fr,
        |      len(list_filter(toks, x -> x IN ('el','los','las','es','y'))) AS s_es,
        |      len(list_filter(toks, x -> x IN ('и','в','не','на','что'))) AS s_ru
        |    FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))),
        |gated AS (SELECT doc_id, text, lang_pred, n_tokens FROM ann
        |  WHERE n_tokens >= 5 AND quality >= 0.3 AND lang_pred = 'en'),
        |iexact AS (SELECT doc_id, text, lang_pred, n_tokens FROM gated
        |  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)),
        |ish AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM iexact) WHERE len(t) >= 3)),
        |isig AS (SELECT doc_id, LIST(h ORDER BY k) AS sig FROM (
        |  SELECT doc_id, k, MIN(substr(md5(sh || ':' || CAST(k AS VARCHAR)), 1, 16)) AS h
        |  FROM ish CROSS JOIN range(64) r(k) GROUP BY doc_id, k) GROUP BY doc_id),
        |ibands AS (SELECT doc_id, b AS band_idx,
        |    array_to_string(sig[b*4+1 : b*4+4], ',') AS band_key
        |  FROM isig CROSS JOIN range(16) rb(b)),
        |scand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ibands a JOIN ibands b ON a.band_idx = b.band_idx
        |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
        |sdrops AS (SELECT DISTINCT id_b FROM scand
        |  JOIN isig sa ON sa.doc_id = id_a JOIN isig sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
        |        / CAST(len(sa.sig) AS DOUBLE) >= 0.7),
        |clean AS (SELECT doc_id, text, lang_pred, n_tokens FROM iexact
        |  WHERE NOT EXISTS (SELECT 1 FROM sdrops WHERE id_b = doc_id)),
        |hx AS (SELECT doc_id, substr(md5(tkn), 1, 16) AS h FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tkn FROM clean)),
        |votes AS (
        |  SELECT doc_id, r.b AS b,
        |    SUM(CASE WHEN (strpos('0123456789abcdef', substr(h, 16 - r.b // 4, 1)) - 1)
        |              & (1 << (r.b % 4)) != 0 THEN 1 ELSE -1 END) AS v
        |  FROM hx, range(64) r(b)
        |  GROUP BY doc_id, r.b),
        |sim AS (SELECT doc_id,
        |  CAST(SUM(CASE WHEN v <= 0 THEN 0
        |           WHEN b = 63 THEN -9223372036854775808
        |           ELSE (CAST(1 AS BIGINT) << b) END) AS BIGINT) AS simhash
        |  FROM votes GROUP BY doc_id),
        |wg AS (SELECT doc_id,
        |  [substr(md5(substr(text, i, 5)), 1, 16)
        |   for i in range(1, greatest(len(text) - 3, 1))] AS h
        |  FROM clean),
        |wfp AS (SELECT DISTINCT doc_id, fp FROM (
        |  SELECT doc_id, unnest(
        |    [list_min(h[i:i+3]) for i in range(1, greatest(len(h) - 2, 2))]) AS fp
        |  FROM wg WHERE len(h) >= 1)),
        |nfp AS (SELECT doc_id, COUNT(*) AS n_fp FROM wfp GROUP BY doc_id)
        |SELECT c.doc_id, c.lang_pred, c.n_tokens, s.simhash,
        |  CAST(COALESCE(f.n_fp, 0) AS INT) AS n_fp,
        |  CAST(8 AS INT) AS n_features
        |FROM clean c JOIN sim s USING (doc_id) LEFT JOIN nfp f USING (doc_id)""".stripMargin,
    "ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        | CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) AS jaccard
        |FROM inter
        | JOIN sizes na ON na.doc_id = id_a
        | JOIN sizes nb ON nb.doc_id = id_b
        |WHERE CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) >= 0.5""".stripMargin,
    "ngram_containment" ->
      // directed pairs; containment = i / |A| is one IEEE division of
      // exact longs, bit-identical in both engines
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b, CAST(i AS DOUBLE) / na.n_sh AS containment
        |FROM inter JOIN sizes na ON na.doc_id = id_a
        |WHERE CAST(i AS DOUBLE) / na.n_sh >= 0.8""".stripMargin,
    "dedup_containment_prune" ->
      // same pair CTE as ngram_containment; one-way containment drops
      // the contained doc, mutual pairs keep the min id
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT id_a, id_b FROM inter JOIN sizes na ON na.doc_id = id_a
        |  WHERE CAST(i AS DOUBLE) / na.n_sh >= 0.8),
        |drops AS (SELECT p.id_a FROM pairs p LEFT JOIN pairs r
        |  ON p.id_a = r.id_b AND p.id_b = r.id_a
        |  WHERE r.id_a IS NULL OR p.id_a > p.id_b)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id_a FROM drops)""".stripMargin,
    "dedup_containment_capped" ->
      // dedup_containment_prune's pair CTE with the IDENTICAL df-cap:
      // shingles held by more than 64 docs leave intersections AND the
      // |A| denominators, so both engines compute the exact containment
      // over the same capped shingle universe (cap inert at sf <= 0.1,
      // biting at the 10x fixture — the measured skew-guard form)
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |hot AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) > 64),
        |sh AS (SELECT doc_id, sh FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (SELECT id_a, id_b FROM inter JOIN sizes na ON na.doc_id = id_a
        |  WHERE CAST(i AS DOUBLE) / na.n_sh >= 0.8),
        |drops AS (SELECT p.id_a FROM pairs p LEFT JOIN pairs r
        |  ON p.id_a = r.id_b AND p.id_b = r.id_a
        |  WHERE r.id_a IS NULL OR p.id_a > p.id_b)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id_a FROM drops)""".stripMargin,
    "minhash_pairs" ->
      // IDENTICAL exact oracle as ngram_jaccard: the registered query
      // verifies every LSH candidate with the exact shingle Jaccard, and
      // the banding (2 rows x 64 bands) makes a miss at j>=0.5 a ~1e-8
      // event, so the pair sets coincide
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        | CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) AS jaccard
        |FROM inter
        | JOIN sizes na ON na.doc_id = id_a
        | JOIN sizes nb ON nb.doc_id = id_b
        |WHERE CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) >= 0.5""".stripMargin,
    "snapshot_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents
        |  WHERE regexp_matches(source, '^src([0-9]|1[0-4])$')),
        |neu AS (SELECT doc_id,
        |  CASE WHEN lang = 'de' THEN upper(text) ELSE text END AS text
        |  FROM documents WHERE regexp_matches(source, '^src([5-9]|1[0-9])$'))
        |SELECT COALESCE(o.doc_id, n.doc_id) AS id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id""".stripMargin,
    "snapshot_diff_digest" ->
      // the digest form's in-query gate asserts class-identity with the
      // exact-text diff, so the exact-form oracle is ITS oracle too
      """WITH old AS (SELECT doc_id, text FROM documents
        |  WHERE regexp_matches(source, '^src([0-9]|1[0-4])$')),
        |neu AS (SELECT doc_id,
        |  CASE WHEN lang = 'de' THEN upper(text) ELSE text END AS text
        |  FROM documents WHERE regexp_matches(source, '^src([5-9]|1[0-9])$'))
        |SELECT COALESCE(o.doc_id, n.doc_id) AS id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id""".stripMargin,
    "ivm_refresh_agg" ->
      // full-recompute oracle over the new snapshot: the delta algebra
      // must be indistinguishable from it (incl. emptied groups absent)
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_value
        |FROM documents
        |WHERE regexp_matches(source, '^src([5-9]|1[0-9])$')
        |GROUP BY lang""".stripMargin,
    "ivm_refresh" ->
      // the oracle is the FULL recompute over the new snapshot — the
      // incremental path must be indistinguishable from it
      """WITH neu AS (SELECT doc_id,
        |  CASE WHEN lang = 'de' THEN upper(text) ELSE text END AS text
        |  FROM documents WHERE regexp_matches(source, '^src([5-9]|1[0-9])$')),
        |t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM neu)
        |SELECT doc_id, len(toks) AS n_tokens,
        | len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS n_stopwords,
        | CAST(length(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len
        |FROM t""".stripMargin,
    "cdc_merge" ->
      // same delta construction (cdcChanges scaladoc), latest-wins via
      // QUALIFY row_number, merge via full-outer + delete filter
      """WITH base AS (SELECT doc_id, text, lang, source, n_chars
        |  FROM documents WHERE regexp_matches(source, '^src([0-9]|1[0-4])$')),
        |changes AS (
        |  SELECT doc_id, 1 AS seq, 'upsert' AS op, text, lang, source, n_chars
        |    FROM documents WHERE regexp_matches(source, '^src1[5-9]$')
        |  UNION ALL
        |  SELECT doc_id, 1, 'upsert', upper(text), lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src([5-9]|1[0-4])$') AND lang = 'de'
        |  UNION ALL
        |  SELECT doc_id, 2, 'delete', text, lang, source, n_chars FROM base
        |    WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'upsert', text || ' [v3]', lang, source, n_chars
        |    FROM base WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'delete', text, lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src1[5-9]$') AND doc_id % 13 = 0),
        |latest AS (SELECT doc_id, op, text, lang, source, n_chars
        |  FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1)
        |SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.text ELSE b.text END AS text,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.lang ELSE b.lang END AS lang,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.source ELSE b.source END
        |    AS source,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.n_chars ELSE b.n_chars END
        |    AS n_chars
        |FROM base b FULL OUTER JOIN latest c ON b.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL OR c.op <> 'delete'""".stripMargin,
    "cdc_merge_versioned" ->
      // the two-batch versioned fold is batch-order-invariant, so its
      // live view answers the ONE-SHOT merge SQL verbatim — the
      // equivalence is the point of the query
      """WITH base AS (SELECT doc_id, text, lang, source, n_chars
        |  FROM documents WHERE regexp_matches(source, '^src([0-9]|1[0-4])$')),
        |changes AS (
        |  SELECT doc_id, 1 AS seq, 'upsert' AS op, text, lang, source, n_chars
        |    FROM documents WHERE regexp_matches(source, '^src1[5-9]$')
        |  UNION ALL
        |  SELECT doc_id, 1, 'upsert', upper(text), lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src([5-9]|1[0-4])$') AND lang = 'de'
        |  UNION ALL
        |  SELECT doc_id, 2, 'delete', text, lang, source, n_chars FROM base
        |    WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'upsert', text || ' [v3]', lang, source, n_chars
        |    FROM base WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'delete', text, lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src1[5-9]$') AND doc_id % 13 = 0),
        |latest AS (SELECT doc_id, op, text, lang, source, n_chars
        |  FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1)
        |SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.text ELSE b.text END AS text,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.lang ELSE b.lang END AS lang,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.source ELSE b.source END
        |    AS source,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.n_chars ELSE b.n_chars END
        |    AS n_chars
        |FROM base b FULL OUTER JOIN latest c ON b.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL OR c.op <> 'delete'""".stripMargin,
    "cdc_merge_evolve" ->
      // the one-shot merge with the drifted column: rows the changeset
      // wins carry rev = doc_id % 5, pre-existing rows widen to NULL
      """WITH base AS (SELECT doc_id, text, lang, source, n_chars
        |  FROM documents WHERE regexp_matches(source, '^src([0-9]|1[0-4])$')),
        |changes AS (
        |  SELECT doc_id, 1 AS seq, 'upsert' AS op, text, lang, source, n_chars
        |    FROM documents WHERE regexp_matches(source, '^src1[5-9]$')
        |  UNION ALL
        |  SELECT doc_id, 1, 'upsert', upper(text), lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src([5-9]|1[0-4])$') AND lang = 'de'
        |  UNION ALL
        |  SELECT doc_id, 2, 'delete', text, lang, source, n_chars FROM base
        |    WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'upsert', text || ' [v3]', lang, source, n_chars
        |    FROM base WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'delete', text, lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src1[5-9]$') AND doc_id % 13 = 0),
        |latest AS (SELECT doc_id, op, text, lang, source, n_chars
        |  FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1)
        |SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.text ELSE b.text END AS text,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.lang ELSE b.lang END AS lang,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.source ELSE b.source END
        |    AS source,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.n_chars ELSE b.n_chars END
        |    AS n_chars,
        |  CASE WHEN c.doc_id IS NOT NULL THEN CAST(c.doc_id % 5 AS INTEGER)
        |    ELSE NULL END AS rev
        |FROM base b FULL OUTER JOIN latest c ON b.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL OR c.op <> 'delete'""".stripMargin,
    "cdc_generation_diff" ->
      // g1 = one-shot merge of the seq>=2 batch (≡ the single-batch
      // versioned fold); g2 = one-shot merge of ALL changes (≡ the
      // two-batch fold, by the batch-order invariance
      // cdc_merge_versioned certifies); diff classifies by text
      """WITH base AS (SELECT doc_id, text, lang, source, n_chars
        |  FROM documents WHERE regexp_matches(source, '^src([0-9]|1[0-4])$')),
        |changes AS (
        |  SELECT doc_id, 1 AS seq, 'upsert' AS op, text, lang, source, n_chars
        |    FROM documents WHERE regexp_matches(source, '^src1[5-9]$')
        |  UNION ALL
        |  SELECT doc_id, 1, 'upsert', upper(text), lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src([5-9]|1[0-4])$') AND lang = 'de'
        |  UNION ALL
        |  SELECT doc_id, 2, 'delete', text, lang, source, n_chars FROM base
        |    WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'upsert', text || ' [v3]', lang, source, n_chars
        |    FROM base WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'delete', text, lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src1[5-9]$') AND doc_id % 13 = 0),
        |lat1 AS (SELECT doc_id, op, text FROM changes WHERE seq >= 2
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1),
        |g1 AS (SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.text ELSE b.text END AS text
        |  FROM base b FULL OUTER JOIN lat1 c ON b.doc_id = c.doc_id
        |  WHERE c.doc_id IS NULL OR c.op <> 'delete'),
        |lat2 AS (SELECT doc_id, op, text FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1),
        |g2 AS (SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN c.doc_id IS NOT NULL THEN c.text ELSE b.text END AS text
        |  FROM base b FULL OUTER JOIN lat2 c ON b.doc_id = c.doc_id
        |  WHERE c.doc_id IS NULL OR c.op <> 'delete')
        |SELECT COALESCE(o.doc_id, n.doc_id) AS id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM g1 o FULL OUTER JOIN g2 n ON o.doc_id = n.doc_id""".stripMargin,
    "cdc_merge_summary" ->
      """WITH base AS (SELECT doc_id, text, lang, source, n_chars
        |  FROM documents WHERE regexp_matches(source, '^src([0-9]|1[0-4])$')),
        |changes AS (
        |  SELECT doc_id, 1 AS seq, 'upsert' AS op, text, lang, source, n_chars
        |    FROM documents WHERE regexp_matches(source, '^src1[5-9]$')
        |  UNION ALL
        |  SELECT doc_id, 1, 'upsert', upper(text), lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src([5-9]|1[0-4])$') AND lang = 'de'
        |  UNION ALL
        |  SELECT doc_id, 2, 'delete', text, lang, source, n_chars FROM base
        |    WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'upsert', text || ' [v3]', lang, source, n_chars
        |    FROM base WHERE doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'delete', text, lang, source, n_chars
        |    FROM documents
        |    WHERE regexp_matches(source, '^src1[5-9]$') AND doc_id % 13 = 0),
        |latest AS (SELECT doc_id, op FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1)
        |SELECT CASE WHEN c.doc_id IS NULL THEN 'unchanged'
        |    WHEN c.op = 'delete' THEN
        |      CASE WHEN b.doc_id IS NULL THEN 'delete_noop' ELSE 'deleted' END
        |    WHEN b.doc_id IS NULL THEN 'inserted'
        |    ELSE 'updated' END AS action,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM base b FULL OUTER JOIN latest c ON b.doc_id = c.doc_id
        |GROUP BY 1""".stripMargin,
    "fuzzy_name_pairs" ->
      // mirrors the blocking exactly: distinct (name, token), df-capped
      // tokens, shared-token candidates, Levenshtein verify
      """WITH dict AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM part GROUP BY p_name),
        |t AS (SELECT DISTINCT name, tok FROM (
        |  SELECT name, unnest(string_split(name, ' ')) AS tok FROM dict)
        |  WHERE tok <> ''),
        |keep AS (SELECT tok FROM t GROUP BY tok HAVING COUNT(*) <= 1000),
        |tk AS (SELECT t.name, t.tok FROM t JOIN keep USING (tok)),
        |cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
        |  FROM tk a JOIN tk b ON a.tok = b.tok AND a.name < b.name)
        |SELECT c.name_a, c.name_b,
        |  CAST(levenshtein(c.name_a, c.name_b) AS INTEGER) AS dist,
        |  da.n AS n_a, db.n AS n_b
        |FROM cand c
        |JOIN dict da ON da.name = c.name_a
        |JOIN dict db ON db.name = c.name_b
        |WHERE levenshtein(c.name_a, c.name_b) <= 2""".stripMargin,
    "entity_resolution" ->
      // fuzzy_name_pairs' blocking verbatim, then the dedup_clusters
      // reach-CTE over md5 name ids, then survivorship by (n DESC,
      // name) — the full linkage pipeline replayed in one query
      """WITH RECURSIVE
        |dict AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM part GROUP BY p_name),
        |named AS (SELECT name, n,
        |  ('0x' || substr(md5(name), 1, 15))::BIGINT AS name_id FROM dict),
        |t AS (SELECT DISTINCT name, tok FROM (
        |  SELECT name, unnest(string_split(name, ' ')) AS tok FROM dict)
        |  WHERE tok <> ''),
        |keep AS (SELECT tok FROM t GROUP BY tok HAVING COUNT(*) <= 1000),
        |tk AS (SELECT t.name, t.tok FROM t JOIN keep USING (tok)),
        |cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
        |  FROM tk a JOIN tk b ON a.tok = b.tok AND a.name < b.name),
        |pairs AS (SELECT name_a, name_b FROM cand
        |  WHERE levenshtein(name_a, name_b) <= 2),
        |idp AS (SELECT na.name_id AS id_a, nb.name_id AS id_b FROM pairs
        |  JOIN named na ON na.name = name_a
        |  JOIN named nb ON nb.name = name_b),
        |edges AS (SELECT id_a AS s, id_b AS d FROM idp
        |  UNION SELECT id_b, id_a FROM idp),
        |reach(id, comp) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.id),
        |lab AS (SELECT nm.name, nm.n,
        |  COALESCE(MIN(r.comp), nm.name_id) AS cluster
        |  FROM named nm LEFT JOIN reach r ON r.id = nm.name_id
        |  GROUP BY nm.name, nm.n, nm.name_id),
        |canon AS (SELECT cluster, name AS canonical_name FROM (
        |  SELECT cluster, name, row_number() OVER (
        |    PARTITION BY cluster ORDER BY n DESC, name) AS rk FROM lab)
        |  WHERE rk = 1),
        |sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
        |  FROM lab GROUP BY cluster)
        |SELECT l.name, c.canonical_name, s.cluster_size, l.n
        |FROM lab l
        |JOIN canon c ON l.cluster = c.cluster
        |JOIN sizes s ON l.cluster = s.cluster""".stripMargin,
    "fuzzy_pairs_exact" ->
      """WITH dict AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
        |FROM dict a JOIN dict b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin,
    "compaction_partitioned_stats" ->
      // per-partition data identity of the staged+compacted table vs
      // the source's GROUP BY; `compacted` TRUE by the driver gate
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
        |  TRUE AS compacted
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "compaction_stats" ->
      // data identity of the staged+compacted table vs the source; the
      // contract booleans are TRUE by the in-plan/driver gates
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_before,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows_after,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey_before,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey_after,
        |  TRUE AS row_identity, TRUE AS files_reduced
        |FROM lineitem""".stripMargin,
    "zorder_zonemap" ->
      // normalize16's clamp+floor-div, the 8-4-2-1 Morton spread as
      // stepwise CTEs, prefix bucketing — all exact integer bit
      // arithmetic, hence hash-checkable
      """WITH st AS (SELECT CAST(max(l_partkey) AS BIGINT) AS px,
        |                   CAST(max(l_suppkey) AS BIGINT) AS sx
        |            FROM lineitem),
        |pts AS (SELECT
        |  (least(greatest(l_partkey, 0), px) * 65535) // px AS x,
        |  (least(greatest(l_suppkey, 0), sx) * 65535) // sx AS y
        |  FROM lineitem, st),
        |a AS (SELECT x, y, (x | (x << 8)) & 16711935 AS xa,
        |  (y | (y << 8)) & 16711935 AS ya FROM pts),
        |b AS (SELECT x, y, (xa | (xa << 4)) & 252645135 AS xb,
        |  (ya | (ya << 4)) & 252645135 AS yb FROM a),
        |c AS (SELECT x, y, (xb | (xb << 2)) & 858993459 AS xc,
        |  (yb | (yb << 2)) & 858993459 AS yc FROM b),
        |d AS (SELECT x, y, (xc | (xc << 1)) & 1431655765 AS xd,
        |  (yc | (yc << 1)) & 1431655765 AS yd FROM c),
        |z AS (SELECT x, y, (xd | (yd << 1)) AS zv FROM d)
        |SELECT zv >> 26 AS bucket,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM z GROUP BY 1""".stripMargin,
    "zorder_zonemap_incremental" ->
      // merge(zm(even), zm(odd)) ≡ zm(all) is asserted in-plan, so the
      // merged frame answers the full-rebuild oracle
      """WITH st AS (SELECT CAST(max(l_partkey) AS BIGINT) AS px,
        |                   CAST(max(l_suppkey) AS BIGINT) AS sx
        |            FROM lineitem),
        |pts AS (SELECT
        |  (least(greatest(l_partkey, 0), px) * 65535) // px AS x,
        |  (least(greatest(l_suppkey, 0), sx) * 65535) // sx AS y
        |  FROM lineitem, st),
        |a AS (SELECT x, y, (x | (x << 8)) & 16711935 AS xa,
        |  (y | (y << 8)) & 16711935 AS ya FROM pts),
        |b AS (SELECT x, y, (xa | (xa << 4)) & 252645135 AS xb,
        |  (ya | (ya << 4)) & 252645135 AS yb FROM a),
        |c AS (SELECT x, y, (xb | (xb << 2)) & 858993459 AS xc,
        |  (yb | (yb << 2)) & 858993459 AS yc FROM b),
        |d AS (SELECT x, y, (xc | (xc << 1)) & 1431655765 AS xd,
        |  (yc | (yc << 1)) & 1431655765 AS yd FROM c),
        |z AS (SELECT x, y, (xd | (yd << 1)) AS zv FROM d)
        |SELECT zv >> 26 AS bucket,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM z GROUP BY 1""".stripMargin,
    "zorder3_zonemap" ->
      (zorder3GraphSql + """
        |SELECT zv >> 42 AS bucket,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y,
        |  min(z) AS min_z, max(z) AS max_z,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM zv3 GROUP BY 1""".stripMargin),
    "zorder3_pruning" ->
      // 3-D zone map from the triple chain, 2-D from the pair chain
      // (m-prefixed), same box; the 2-D map cannot test the z bounds
      (zorder3GraphSql + """,
        |ma AS (SELECT x, y, z, (x | (x << 8)) & 16711935 AS xa,
        |  (y | (y << 8)) & 16711935 AS ya FROM pts),
        |mb AS (SELECT x, y, z, (xa | (xa << 4)) & 252645135 AS xb,
        |  (ya | (ya << 4)) & 252645135 AS yb FROM ma),
        |mc AS (SELECT x, y, z, (xb | (xb << 2)) & 858993459 AS xc,
        |  (yb | (yb << 2)) & 858993459 AS yc FROM mb),
        |md AS (SELECT x, y, z, (xc | (xc << 1)) & 1431655765 AS xd,
        |  (yc | (yc << 1)) & 1431655765 AS yd FROM mc),
        |mz AS (SELECT x, y, z, (xd | (yd << 1)) AS zv2 FROM md),
        |zm3 AS (SELECT zv >> 36 AS bucket,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y,
        |  max(y) AS max_y, min(z) AS min_z, max(z) AS max_z,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM zv3 GROUP BY 1),
        |zm2 AS (SELECT zv2 >> 20 AS bucket,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y,
        |  max(y) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM mz GROUP BY 1),
        |box AS (SELECT
        |  (least(greatest(500, 0), px) * 65535) // px AS x0,
        |  (least(greatest(600, 0), px) * 65535) // px AS x1,
        |  (least(greatest(20, 0), sx) * 65535) // sx AS y0,
        |  (least(greatest(30, 0), sx) * 65535) // sx AS y1,
        |  (least(greatest(1, 0), qx) * 65535) // qx AS z0,
        |  (least(greatest(10, 0), qx) * 65535) // qx AS z1 FROM st),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_rows
        |  FROM lineitem WHERE l_partkey BETWEEN 500 AND 600
        |  AND l_suppkey BETWEEN 20 AND 30
        |  AND l_quantity >= 1 AND l_quantity <= 10),
        |s3 AS (SELECT 'zorder3' AS layout,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0
        |    AND min_z <= z1 AND max_z >= z0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0
        |    AND min_z <= z1 AND max_z >= z0 THEN n_rows ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_rows
        |  FROM zm3, box),
        |s2 AS (SELECT 'zorder2d' AS layout,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN n_rows ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_rows
        |  FROM zm2, box)
        |SELECT layout, n_buckets, n_candidate_buckets, n_candidate_rows,
        |  n_exact_rows
        |FROM (SELECT * FROM s3 UNION ALL SELECT * FROM s2), ex""".stripMargin),
    "hilbert_zonemap" ->
      (hilbertGraphSql + """
        |SELECT hd >> 26 AS bucket,
        |  min(ox) AS min_x, max(ox) AS max_x,
        |  min(oy) AS min_y, max(oy) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM h0 GROUP BY 1""".stripMargin)
  )
}
