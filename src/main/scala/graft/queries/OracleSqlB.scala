package graft.queries

import QueryHelpers._
import OracleSqlDefs._

/** One half of the [[graft.SparkEntry.oracleSql]] registry (mechanical
  * split; entries verbatim, alphabetic order preserved within each
  * half).
  */
private[graft] object OracleSqlB {

  def map: Map[String, String] = Map(
    "hilbert_pruning" ->
      // the hilbert walk from the step CTEs, morton from the spread
      // chain (m-prefixed to avoid colliding with the walk); each
      // layout ranked by (curve, x, y) and cut into 64 equal-count
      // chunks — the curveFileMap construction — then the same
      // candidate test against the same box
      (hilbertGraphSql + """,
        |ma AS (SELECT ox AS x, oy AS y, (ox | (ox << 8)) & 16711935 AS xa,
        |  (oy | (oy << 8)) & 16711935 AS ya FROM h0),
        |mb AS (SELECT x, y, (xa | (xa << 4)) & 252645135 AS xb,
        |  (ya | (ya << 4)) & 252645135 AS yb FROM ma),
        |mc AS (SELECT x, y, (xb | (xb << 2)) & 858993459 AS xc,
        |  (yb | (yb << 2)) & 858993459 AS yc FROM mb),
        |md AS (SELECT x, y, (xc | (xc << 1)) & 1431655765 AS xd,
        |  (yc | (yc << 1)) & 1431655765 AS yd FROM mc),
        |mz AS (SELECT x, y, (xd | (yd << 1)) AS zv FROM md),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
        |hr AS (SELECT ox, oy,
        |  CAST(row_number() OVER (ORDER BY hd, ox, oy) - 1 AS BIGINT) AS rn
        |  FROM h0),
        |hm AS (SELECT (rn * 64) // n AS bucket, min(ox) AS min_x,
        |  max(ox) AS max_x, min(oy) AS min_y, max(oy) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM hr, nn GROUP BY 1),
        |zr AS (SELECT x, y,
        |  CAST(row_number() OVER (ORDER BY zv, x, y) - 1 AS BIGINT) AS rn
        |  FROM mz),
        |zm AS (SELECT (rn * 64) // n AS bucket, min(x) AS min_x,
        |  max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM zr, nn GROUP BY 1),
        |box AS (SELECT
        |  (least(greatest(500, 0), px) * 65535) // px AS x0,
        |  (least(greatest(600, 0), px) * 65535) // px AS x1,
        |  (least(greatest(20, 0), sx) * 65535) // sx AS y0,
        |  (least(greatest(30, 0), sx) * 65535) // sx AS y1 FROM st),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_rows
        |  FROM lineitem WHERE l_partkey BETWEEN 500 AND 600
        |  AND l_suppkey BETWEEN 20 AND 30),
        |hstat AS (SELECT 'hilbert' AS layout,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN n_rows ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_rows
        |  FROM hm, box),
        |zstat AS (SELECT 'zorder' AS layout,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN n_rows ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_rows
        |  FROM zm, box)
        |SELECT layout, n_buckets, n_candidate_buckets, n_candidate_rows,
        |  n_exact_rows
        |FROM (SELECT * FROM hstat UNION ALL SELECT * FROM zstat), ex""".stripMargin),
    "dq_audit" ->
      """SELECT 'not_null(l_orderkey)' AS constraint_name,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_range(l_quantity,1,50)', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_range(l_linenumber,1,4)', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN NOT (l_linenumber >= 1 AND l_linenumber <= 4) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'matches(l_returnflag)', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN NOT regexp_matches(l_returnflag, '^[ARN]$') THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'matches(l_linestatus)', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN NOT regexp_matches(l_linestatus, '^F$') THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'unique(l_orderkey,l_linenumber)',
        |  CAST(coalesce(sum(c), 0) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT)
        |FROM (SELECT count(*) AS c FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber)
        |UNION ALL
        |SELECT 'foreign_key(l_orderkey->o_orderkey)',
        |  CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN l_orderkey IS NOT NULL
        |    AND o2.o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM lineitem LEFT JOIN
        |  (SELECT DISTINCT o_orderkey FROM orders) o2
        |  ON l_orderkey = o2.o_orderkey""".stripMargin,
    "table_profile" -> ordersProfileOracleSql,
    "dq_suggest" ->
      // the rule derivation replayed over the profile CTE: same
      // row-local predicates, TRY_CAST as the lossless-integer gate
      s"""WITH prof AS (
         |$ordersProfileOracleSql
         |)
         |SELECT column_name, 'not_null' AS rule_type,
         |       CAST(NULL AS BIGINT) AS lo, CAST(NULL AS BIGINT) AS hi
         |FROM prof WHERE n_rows > 0 AND n_nonnull = n_rows
         |UNION ALL
         |SELECT column_name, 'unique', CAST(NULL AS BIGINT),
         |       CAST(NULL AS BIGINT)
         |FROM prof WHERE is_candidate_key
         |UNION ALL
         |SELECT column_name, 'in_range',
         |       TRY_CAST(min_value AS BIGINT),
         |       TRY_CAST(max_value AS BIGINT)
         |FROM prof
         |WHERE n_nonnull > 0
         |  AND data_type IN ('tinyint', 'smallint', 'int', 'bigint')
         |  AND TRY_CAST(min_value AS BIGINT) IS NOT NULL
         |  AND TRY_CAST(max_value AS BIGINT) IS NOT NULL""".stripMargin,
    "profile_top_values" -> {
      def one(c: String): String =
        s"""SELECT column_name, value, n, rnk FROM (
           |  SELECT '$c' AS column_name, value, n,
           |    CAST(row_number() OVER (ORDER BY n DESC, value) AS INT) AS rnk
           |  FROM (SELECT CAST($c AS VARCHAR) AS value,
           |               CAST(count(*) AS BIGINT) AS n
           |        FROM orders WHERE $c IS NOT NULL GROUP BY 1)
           |) WHERE rnk <= 3""".stripMargin
      Seq("o_orderstatus", "o_orderpriority", "o_custkey")
        .map(one).mkString("\nUNION ALL\n")
    },
    "profile_fds" -> {
      def one(a: String, b: String): String =
        s"""SELECT '$a->$b' AS dependency,
           |  CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(coalesce(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violating_groups,
           |  (coalesce(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) = 0) AS holds
           |FROM (SELECT $a, count(DISTINCT $b) AS k
           |      FROM orders GROUP BY $a)""".stripMargin
      Seq("o_orderkey" -> "o_custkey", "o_custkey" -> "o_orderkey",
        "o_custkey" -> "o_orderstatus",
        "o_orderpriority" -> "o_orderstatus")
        .map { case (a, b) => one(a, b) }.mkString("\nUNION ALL\n")
    },
    "langid_confusion" ->
      """WITH ann AS (
        |  SELECT lang,
        |    CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'de'
        |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'fr'
        |         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'es'
        |         ELSE 'ru' END AS lang_pred
        |  FROM (
        |    SELECT lang,
        |      len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |      len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
        |      len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS s_fr,
        |      len(list_filter(toks, x -> x IN ('el','los','las','es','y'))) AS s_es,
        |      len(list_filter(toks, x -> x IN ('и','в','не','на','что'))) AS s_ru
        |    FROM (SELECT lang, string_split(text, ' ') AS toks
        |          FROM documents)))
        |SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        |FROM ann GROUP BY 1, 2""".stripMargin,
    "profile_drift" ->
      """SELECT 'o_orderkey' AS column_name, 'common' AS status,
        |  'bigint' AS old_type, 'bigint' AS new_type,
        |  FALSE AS type_changed,
        |  (SELECT CAST(count(o_orderkey) AS BIGINT) FROM orders) AS old_nonnull,
        |  (SELECT CAST(count(o_orderkey) AS BIGINT) FROM orders) AS new_nonnull,
        |  (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS old_distinct,
        |  (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS new_distinct
        |UNION ALL
        |SELECT 'o_custkey', 'common', 'bigint', 'string', TRUE,
        |  (SELECT CAST(count(o_custkey) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(o_custkey) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders)
        |UNION ALL
        |SELECT 'o_orderstatus', 'common', 'string', 'string', FALSE,
        |  (SELECT CAST(count(o_orderstatus) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(o_orderstatus) AS BIGINT) FROM orders
        |   WHERE o_orderkey % 10 <> 0),
        |  (SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
        |   WHERE o_orderkey % 10 <> 0)
        |UNION ALL
        |SELECT 'o_orderpriority', 'removed', 'string',
        |  CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN),
        |  (SELECT CAST(count(o_orderpriority) AS BIGINT) FROM orders),
        |  CAST(NULL AS BIGINT),
        |  (SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders),
        |  CAST(NULL AS BIGINT)
        |UNION ALL
        |SELECT 'o_channel', 'added', CAST(NULL AS VARCHAR), 'string',
        |  CAST(NULL AS BOOLEAN),
        |  CAST(NULL AS BIGINT),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  CAST(NULL AS BIGINT),
        |  (SELECT CAST(count(DISTINCT o_orderkey % 3) AS BIGINT) FROM orders)""".stripMargin,
    "profile_psi" -> {
      val cmp = (1 to 7).map(i =>
        s"CASE WHEN v > qs[$i] THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH b AS (SELECT quantile_cont(o_custkey,
         |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs
         |  FROM orders),
         |rc AS (SELECT ($cmp) AS bucket, count(*) AS n FROM
         |  (SELECT o_custkey AS v FROM orders WHERE o_custkey IS NOT NULL), b
         |  GROUP BY 1),
         |nc AS (SELECT ($cmp) AS bucket, count(*) AS n FROM
         |  (SELECT (o_custkey + 300) % 1500 AS v FROM orders
         |   WHERE o_custkey IS NOT NULL), b
         |  GROUP BY 1)
         |SELECT coalesce(rc.bucket, nc.bucket) AS bucket,
         |  CAST(coalesce(rc.n, 0) AS BIGINT) AS ref_n,
         |  CAST(coalesce(nc.n, 0) AS BIGINT) AS new_n
         |FROM rc FULL OUTER JOIN nc ON rc.bucket = nc.bucket""".stripMargin
    },
    "profile_histogram" -> {
      val cmp = (1 to 7).map(i =>
        s"CASE WHEN o_custkey > qs[$i] THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH b AS (SELECT
         |  quantile_cont(o_custkey,
         |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs,
         |  CAST(min(o_custkey) AS DOUBLE) AS mn,
         |  CAST(max(o_custkey) AS DOUBLE) AS mx
         |  FROM orders),
         |r AS (SELECT ($cmp) AS bucket
         |  FROM orders, b WHERE o_custkey IS NOT NULL)
         |SELECT bucket,
         |  CASE WHEN bucket = 0 THEN any_value(b.mn)
         |       ELSE any_value(b.qs)[bucket] END AS lo_bound,
         |  CASE WHEN bucket = 7 THEN any_value(b.mx)
         |       ELSE any_value(b.qs)[bucket + 1] END AS hi_bound,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM r, b GROUP BY bucket""".stripMargin
    },
    "corpus_balanced_sample" ->
      """SELECT doc_id, lang, rk AS sample_rank FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4),
        |               CAST(doc_id AS VARCHAR)) AS INT) AS rk
        |  FROM documents)
        |WHERE rk <= 16""".stripMargin,
    "event_anomalies" -> eventAnomaliesOracleSql,
    "event_anomalies_dense" ->
      // the densified verdict: every (type, hour) in the load-spanning
      // hourly calendar gets a row, absent ones at cnt=0
      """WITH series AS (
        |  SELECT event_type, date_trunc('hour', ts) AS event_hour,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT unnest(generate_series(date_trunc('hour', min(ts)),
        |                                date_trunc('hour', max(ts)),
        |                                INTERVAL 1 HOUR)) AS event_hour
        |  FROM events),
        |dense AS (
        |  SELECT g.event_type, c.event_hour, coalesce(s.cnt, 0) AS cnt
        |  FROM (SELECT DISTINCT event_type FROM series) g
        |  CROSS JOIN cal c
        |  LEFT JOIN series s ON s.event_type = g.event_type
        |                    AND s.event_hour = c.event_hour),
        |med AS (SELECT event_type, median(cnt) AS med
        |        FROM dense GROUP BY 1),
        |wm AS (SELECT d.event_type, d.event_hour, d.cnt, m.med,
        |              abs(d.cnt - m.med) AS adev
        |       FROM dense d JOIN med m ON d.event_type = m.event_type),
        |mad AS (SELECT event_type, median(adev) AS mad
        |        FROM wm GROUP BY 1)
        |SELECT w.event_type, w.event_hour, w.cnt, w.med, d.mad,
        |       (w.adev > 3.0 * d.mad) AS is_anomaly
        |FROM wm w JOIN mad d ON w.event_type = d.event_type""".stripMargin,
    // fold-then-detect == detect over all events ever streamed: same
    // SQL, and a hash match proves the count-store compaction lossless
    "count_store_compaction" -> eventAnomaliesOracleSql,
    "event_drift" ->
      """WITH series AS (
        |  SELECT event_type, date_trunc('hour', ts) AS event_hour,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, median(cnt) AS med
        |        FROM series GROUP BY 1),
        |wm AS (SELECT s.event_type, s.event_hour, s.cnt, m.med,
        |              abs(s.cnt - m.med) AS adev
        |       FROM series s JOIN med m ON s.event_type = m.event_type),
        |mad AS (SELECT event_type, median(adev) AS mad
        |        FROM wm GROUP BY 1),
        |base AS (SELECT w.event_type, w.event_hour, w.cnt, w.med, d.mad,
        |  (w.cnt - w.med - 0.5 * d.mad) AS dp,
        |  (w.med - w.cnt - 0.5 * d.mad) AS dn
        |  FROM wm w JOIN mad d ON w.event_type = d.event_type),
        |s1 AS (SELECT *,
        |  sum(dp) OVER (PARTITION BY event_type ORDER BY event_hour
        |                ROWS UNBOUNDED PRECEDING) AS sp,
        |  sum(dn) OVER (PARTITION BY event_type ORDER BY event_hour
        |                ROWS UNBOUNDED PRECEDING) AS sn
        |  FROM base),
        |s2 AS (SELECT *,
        |  sp - least(0, min(sp) OVER (PARTITION BY event_type
        |    ORDER BY event_hour ROWS UNBOUNDED PRECEDING)) AS cusum_pos,
        |  sn - least(0, min(sn) OVER (PARTITION BY event_type
        |    ORDER BY event_hour ROWS UNBOUNDED PRECEDING)) AS cusum_neg
        |  FROM s1)
        |SELECT event_type, event_hour, cnt, cusum_pos, cusum_neg,
        |  (cusum_pos > 5.0 * mad OR cusum_neg > 5.0 * mad) AS is_drift
        |FROM s2""".stripMargin,
    "bloom_index_build" -> bloomBuildOracleSql,
    // OR-folding partial builds == one full build: same SQL, and a
    // hash match proves the store compaction lossless bit-for-bit
    "bloom_store_compaction" -> bloomBuildOracleSql,
    "bloom_index_prune" ->
      s"""WITH raw AS (
         |  SELECT o_orderkey // 256 AS chunk,
         |         unnest(${bloomPosListSql("CAST(o_custkey AS VARCHAR)")}) AS pos
         |  FROM orders WHERE o_custkey IS NOT NULL),
         |idx AS (
         |  SELECT chunk, pos // 63 AS word,
         |         bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bitmap
         |  FROM raw GROUP BY 1, 2),
         |probes AS (SELECT unnest(['7','42','137','999','1250',
         |                          '100007','100042','100137']) AS probe_key),
         |ppos AS (
         |  SELECT DISTINCT probe_key, pos // 63 AS word,
         |         CAST(1 AS BIGINT) << CAST(pos % 63 AS INT) AS mask
         |  FROM (SELECT probe_key,
         |               unnest(${bloomPosListSql("probe_key")}) AS pos
         |        FROM probes)),
         |need AS (SELECT probe_key, count(*) AS need FROM ppos GROUP BY 1),
         |hits AS (
         |  SELECT probe_key, chunk, count(*) AS hits
         |  FROM idx JOIN ppos USING (word)
         |  WHERE (bitmap & mask) = mask GROUP BY 1, 2),
         |cand AS (SELECT h.probe_key, h.chunk FROM hits h
         |         JOIN need n ON h.probe_key = n.probe_key
         |         WHERE h.hits = n.need),
         |truth AS (
         |  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS probe_key,
         |         o_orderkey // 256 AS chunk
         |  FROM orders
         |  WHERE CAST(o_custkey AS VARCHAR) IN (SELECT probe_key FROM probes)),
         |cc AS (SELECT probe_key, count(*) AS n FROM cand GROUP BY 1),
         |tc AS (SELECT probe_key, count(*) AS n FROM truth GROUP BY 1)
         |SELECT p.probe_key,
         |  CAST(coalesce(cc.n, 0) AS BIGINT) AS n_candidates,
         |  CAST(coalesce(tc.n, 0) AS BIGINT) AS n_true
         |FROM probes p
         |LEFT JOIN cc ON p.probe_key = cc.probe_key
         |LEFT JOIN tc ON p.probe_key = tc.probe_key""".stripMargin,
    "zonemap_prune_scan" ->
      // the pruned scan must be indistinguishable from the raw filter
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 500 AND 600
        |  AND l_suppkey BETWEEN 20 AND 30""".stripMargin,
    "zonemap3_prune_scan" ->
      // 3-D pruned scan ≡ the raw 3-range filter
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 300 AND 900
        |  AND l_suppkey BETWEEN 5 AND 60
        |  AND l_orderkey <= 300000""".stripMargin,
    "zonemap_prune_string" ->
      // string-box pruned scan ≡ the raw date-string range filter
      """SELECT l_orderkey,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |       l_quantity
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m-%d') >= '1995-03-01'
        |  AND strftime(l_shipdate, '%Y-%m-%d') < '1995-06-01'""".stripMargin,
    "zorder_pruning" ->
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
        |z AS (SELECT x, y, (xd | (yd << 1)) AS zv FROM d),
        |zm AS (SELECT zv >> 26 AS bucket, min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM z GROUP BY 1),
        |lm AS (SELECT x >> 10 AS bucket, min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM z GROUP BY 1),
        |box AS (SELECT
        |  (least(greatest(500, 0), px) * 65535) // px AS x0,
        |  (least(greatest(600, 0), px) * 65535) // px AS x1,
        |  (least(greatest(20, 0), sx) * 65535) // sx AS y0,
        |  (least(greatest(30, 0), sx) * 65535) // sx AS y1 FROM st),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_rows
        |  FROM lineitem WHERE l_partkey BETWEEN 500 AND 600
        |  AND l_suppkey BETWEEN 20 AND 30),
        |zstat AS (SELECT 'zorder' AS layout,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN n_rows ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_rows
        |  FROM zm, box),
        |lstat AS (SELECT 'linear' AS layout,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_buckets,
        |  CAST(COALESCE(SUM(CASE WHEN min_x <= x1 AND max_x >= x0
        |    AND min_y <= y1 AND max_y >= y0 THEN n_rows ELSE 0 END), 0)
        |    AS BIGINT) AS n_candidate_rows
        |  FROM lm, box)
        |SELECT layout, n_buckets, n_candidate_buckets, n_candidate_rows,
        |  n_exact_rows
        |FROM (SELECT * FROM zstat UNION ALL SELECT * FROM lstat), ex""".stripMargin,
    "source_jaccard_exact" ->
      // per-source distinct 3-gram sets (ngram_jaccard's comprehension),
      // pairwise |A∩B| via equi-join, every pair kept through the
      // sizes cross frame; counts CAST from HUGEINT (r8 rule), 0/0
      // guarded to 0.0 on both sides
      """WITH sh AS (SELECT DISTINCT source, sh FROM (
        |  SELECT source,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 3)),
        |sizes AS (SELECT d.source, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |  FROM (SELECT DISTINCT source FROM documents) d
        |  LEFT JOIN (SELECT source, COUNT(*) AS n FROM sh GROUP BY source) c
        |    USING (source)),
        |ints AS (SELECT a.source AS source_a, b.source AS source_b,
        |    COUNT(*) AS ni
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT x.source AS source_a, y.source AS source_b,
        |  CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_int,
        |  CAST(x.n + y.n - COALESCE(i.ni, 0) AS BIGINT) AS n_union,
        |  CASE WHEN x.n + y.n - COALESCE(i.ni, 0) = 0 THEN 0.0
        |       ELSE CAST(COALESCE(i.ni, 0) AS DOUBLE)
        |            / CAST(x.n + y.n - COALESCE(i.ni, 0) AS DOUBLE) END
        |    AS jaccard
        |FROM sizes x JOIN sizes y ON x.source < y.source
        |LEFT JOIN ints i
        |  ON i.source_a = x.source AND i.source_b = y.source""".stripMargin,
    "simhash_codes_portable" ->
      // both engines: per token, first 64 bits of md5 (= 16 hex chars,
      // decoded nibble-wise here), ±1 vote per bit over token
      // OCCURRENCES, code bit = vote sum > 0. The signed int64 is
      // rebuilt from bits with an explicit -2^63 term for bit 63 and
      // the SUM cast back from HUGEINT (the r8 rule).
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |hx AS (SELECT doc_id, substr(md5(t), 1, 16) AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, r.b AS b,
        |    SUM(CASE WHEN (strpos('0123456789abcdef', substr(h, 16 - r.b // 4, 1)) - 1)
        |              & (1 << (r.b % 4)) != 0 THEN 1 ELSE -1 END) AS v
        |  FROM hx, range(64) r(b)
        |  GROUP BY doc_id, r.b)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN v <= 0 THEN 0
        |           WHEN b = 63 THEN -9223372036854775808
        |           ELSE (CAST(1 AS BIGINT) << b) END) AS BIGINT) AS simhash
        |FROM votes GROUP BY doc_id""".stripMargin,
    "simhash_pairs_portable" ->
      // exact all-pairs hamming over the portable codes: the engine's
      // pigeonhole join must reproduce this set EXACTLY (no recall
      // slack) — bit_count(xor) is two's-complement popcount in both
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |hx AS (SELECT doc_id, substr(md5(t), 1, 16) AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, r.b AS b,
        |    SUM(CASE WHEN (strpos('0123456789abcdef', substr(h, 16 - r.b // 4, 1)) - 1)
        |              & (1 << (r.b % 4)) != 0 THEN 1 ELSE -1 END) AS v
        |  FROM hx, range(64) r(b)
        |  GROUP BY doc_id, r.b),
        |code AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN v <= 0 THEN 0
        |             WHEN b = 63 THEN -9223372036854775808
        |             ELSE (CAST(1 AS BIGINT) << b) END) AS BIGINT) AS simhash
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM code a JOIN code b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "boilerplate_scores" ->
      // portable-fingerprint twin of the winnowing kernel: both engines
      // fingerprint with substr(md5(gram),1,16) (lowercase hex compares
      // identically as ASCII), take the min per 8-window of the 8-gram
      // hash stream — min-of-all for docs with 1..7 grams via the
      // greatest(...,2) clamp, none for gram-less docs — then count
      // distinct fps and those shared by >= 2 docs. n_shared's
      // SUM(CASE) is CAST back from DuckDB's HUGEINT (the r8 rule).
      """WITH g AS (SELECT doc_id,
        |  [substr(md5(substr(text, i, 8)), 1, 16)
        |   for i in range(1, greatest(len(text) - 6, 1))] AS h
        |  FROM documents),
        |fp AS (SELECT DISTINCT doc_id, fp FROM (
        |  SELECT doc_id, unnest(
        |    [list_min(h[i:i+7]) for i in range(1, greatest(len(h) - 6, 2))]) AS fp
        |  FROM g WHERE len(h) >= 1)),
        |shared AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) >= 2),
        |agg AS (SELECT f.doc_id, COUNT(*) AS n_fp,
        |  SUM(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
        |  FROM fp f LEFT JOIN shared s USING (fp) GROUP BY f.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a.n_fp, 0) AS BIGINT) AS n_fp,
        |  CAST(COALESCE(a.n_shared, 0) AS BIGINT) AS n_shared,
        |  CASE WHEN COALESCE(a.n_fp, 0) = 0 THEN 0.0
        |       ELSE CAST(a.n_shared AS DOUBLE) / CAST(a.n_fp AS DOUBLE) END
        |    AS boilerplate_frac
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,
    // k=5/w=4 winnowing twin: the kernel emits DISTINCT ASCENDING
    // fingerprints, so n_fp = count distinct and min_fp = MIN — the
    // same comprehension as boilerplate_scores' fp stage at (8,8)
    "winnow_fingerprints_portable" ->
      """WITH g AS (SELECT doc_id,
        |  [substr(md5(substr(text, i, 5)), 1, 16)
        |   for i in range(1, greatest(len(text) - 3, 1))] AS h
        |  FROM documents),
        |fp AS (SELECT DISTINCT doc_id, fp FROM (
        |  SELECT doc_id, unnest(
        |    [list_min(h[i:i+3]) for i in range(1, greatest(len(h) - 2, 2))]) AS fp
        |  FROM g WHERE len(h) >= 1)),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_fp,
        |  MIN(fp) AS min_fp FROM fp GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.n_fp, 0) AS n_fp, a.min_fp AS min_fp
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,
    // group MinHash union: min over a union of shingle sets = min over
    // per-set mins, so DISTINCT (source, shingle) + per-(source, k) MIN
    // reproduces the engine's per-doc-signature fold exactly
    "source_minhash_jaccard_portable" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id % 10 = 0),
        |sh AS (SELECT DISTINCT source, sh FROM (
        |  SELECT source,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |gsig AS (SELECT source, k,
        |  MIN(substr(md5(sh || ':' || CAST(k AS VARCHAR)), 1, 16)) AS h
        |  FROM sh CROSS JOIN range(64) r(k) GROUP BY source, k)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS DOUBLE) / 64.0
        |    AS est_jaccard
        |FROM gsig a JOIN gsig b ON a.k = b.k AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "novelty_scores" ->
      // exact-text twin of the hashed-shingle plan (ngram_jaccard's
      // 3-gram comprehension); DISTINCT per doc mirrors array_distinct
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |dsh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE regexp_matches(source, '^src1[0-9]$') AND len(t) >= 3)),
        |rsh AS (SELECT DISTINCT sh FROM (
        |  SELECT unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE regexp_matches(source, '^src[0-9]$') AND len(t) >= 3)),
        |agg AS (SELECT doc_id, COUNT(*) AS n_sh,
        |  CAST(SUM(CASE WHEN r.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_known
        |  FROM dsh d LEFT JOIN rsh r USING (sh) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(a.n_sh, 0) AS n_sh,
        |  COALESCE(a.n_known, 0) AS n_known
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |WHERE regexp_matches(d.source, '^src1[0-9]$')""".stripMargin,
    "duplicate_spans" ->
      // exact-text twin of the hashed-span plan; gaps (pos - prev) are
      // base-independent, so DuckDB's 1-based positions match Spark's
      // 0-based posexplode
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (SELECT doc_id, pos, array_to_string(t[pos:pos+7], ' ') AS sh
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS pos
        |        FROM toks WHERE len(t) >= 8)),
        |hot AS (SELECT sh FROM grams GROUP BY sh HAVING COUNT(*) >= 2),
        |seq AS (SELECT doc_id, pos,
        |  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |  FROM grams JOIN hot USING (sh)),
        |cov AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
        |  SUM(CASE WHEN prev IS NULL THEN 8 ELSE LEAST(8, pos - prev) END) AS dup_tokens
        |  FROM seq GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(c.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
        |  CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens
        |FROM documents d LEFT JOIN cov c ON d.doc_id = c.doc_id""".stripMargin,
    "strip_duplicate_spans" ->
      // DuckDB's 1-based positions are self-consistent (coverage tests
      // s <= i < s+8 in the same base); empty-array array_to_string is
      // NULL in DuckDB, hence the final COALESCE for fully-covered docs
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (SELECT doc_id, pos, array_to_string(tk[pos:pos+7], ' ') AS sh
        |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS pos
        |        FROM toks WHERE len(tk) >= 8)),
        |hot AS (SELECT sh FROM grams GROUP BY sh HAVING COUNT(*) >= 2),
        |starts AS (SELECT doc_id, list_sort(list(pos)) AS st
        |  FROM grams JOIN hot USING (sh) GROUP BY doc_id),
        |kept AS (SELECT t.doc_id,
        |  [t.tk[i] for i in range(1, len(t.tk) + 1)
        |   if len(list_filter(coalesce(s.st, []), x -> x <= i AND i < x + 8)) = 0]
        |    AS kt,
        |  CAST(len(t.tk) AS BIGINT) AS n_tokens
        |  FROM toks t LEFT JOIN starts s ON t.doc_id = s.doc_id)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kt, ' '), '') AS clean_text,
        |  n_tokens,
        |  n_tokens - CAST(len(kt) AS BIGINT) AS n_removed
        |FROM kept""".stripMargin,
    "dedup_clusters" ->
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
        |  SELECT e.t, r.comp FROM reach r JOIN edges e ON e.s = r.id)
        |SELECT d.doc_id, COALESCE(MIN(r.comp), d.doc_id) AS component
        |FROM documents d LEFT JOIN reach r ON r.id = d.doc_id
        |GROUP BY d.doc_id""".stripMargin,
    "dedup_clusters_capped" -> dedupClustersSql(Some(64)),
    "doc_pagerank" -> docPagerankSql(3),
    "doc_pagerank_capped" -> docPagerankSql(3, Some(64)),
    "graph_communities" -> docLabelPropSql(3),
    "doc_pagerank_weighted" -> docPagerankWeightedSql(3),
    "graph_kcore" -> graphKcoreSql(2, 4),
    "graph_triangles" ->
      // the dedup_clusters pair graph; triangles enumerated a<b<c by
      // the canonical 3-way join (the oracle can afford it — the
      // registered entry uses degree-ordered wedges for skew safety,
      // and the per-node counts are orientation-independent)
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
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
        |tri AS (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
        |  FROM pairs e1
        |  JOIN pairs e2 ON e2.id_a = e1.id_b
        |  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
        |tcnt AS (SELECT nid, COUNT(*) AS tc FROM (
        |  SELECT a AS nid FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri) GROUP BY nid),
        |deg AS (SELECT nid, COUNT(*) AS dg FROM (
        |  SELECT id_a AS nid FROM pairs UNION ALL SELECT id_b FROM pairs)
        |  GROUP BY nid)
        |SELECT d.doc_id,
        |  CAST(COALESCE(g.dg, 0) AS BIGINT) AS degree,
        |  CAST(COALESCE(t.tc, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN COALESCE(g.dg, 0) >= 2
        |    THEN CAST(2 * COALESCE(t.tc, 0) AS DOUBLE) /
        |         CAST(g.dg * (g.dg - 1) AS DOUBLE)
        |    ELSE 0.0 END AS clustering
        |FROM documents d
        |LEFT JOIN deg g ON g.nid = d.doc_id
        |LEFT JOIN tcnt t ON t.nid = d.doc_id""".stripMargin,
    "dedup_cluster_sizes" ->
      // the dedup_clusters recursive CTE, rolled up twice: component ->
      // member count -> histogram of cluster sizes
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
        |labels AS (SELECT d.doc_id, COALESCE(MIN(r.comp), d.doc_id) AS component
        |  FROM documents d LEFT JOIN reach r ON r.id = d.doc_id
        |  GROUP BY d.doc_id),
        |members AS (SELECT component, COUNT(*) AS n_members
        |  FROM labels GROUP BY component)
        |SELECT n_members, COUNT(*) AS n_clusters
        |FROM members GROUP BY n_members""".stripMargin,
    "dedup_corpus" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |drops AS (SELECT DISTINCT id_b FROM inter
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) >= 0.5)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE id_b = doc_id)""".stripMargin,
    "text_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, text, toks,
        |  len(toks) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
        |  CAST(length(text) - (len(toks) - 1) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_token_len,
        |  len(list_filter(toks, x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS n_stopwords,
        |  len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
        |  len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS s_fr,
        |  len(list_filter(toks, x -> x IN ('el','los','las','es','y'))) AS s_es,
        |  len(list_filter(toks, x -> x IN ('и','в','не','на','что'))) AS s_ru
        | FROM t)
        |SELECT doc_id, n_tokens, n_word_tokens, avg_token_len, n_stopwords,
        | CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'en'
        |      WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'de'
        |      WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'fr'
        |      WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_ru) THEN 'es'
        |      ELSE 'ru' END AS lang_pred,
        | (least(CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, CAST(1.0 AS DOUBLE))
        |  + CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END
        |  + least(CAST(n_tokens AS DOUBLE) / 20.0, CAST(1.0 AS DOUBLE))) / 3.0 AS quality
        |FROM b""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |   ' +', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,
    "text_repetition" ->
      // the explode+groupBy formulation of the per-row kernel: counts are
      // integers in both engines, fractions one identical double division
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g2 AS (SELECT doc_id,
        |  unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS g
        |  FROM toks WHERE len(t) >= 2),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
        |s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total2,
        |  COUNT(*) AS dist2, CAST(MAX(c) AS BIGINT) AS mx2
        |  FROM c2 GROUP BY doc_id),
        |g3 AS (SELECT doc_id,
        |  unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS g
        |  FROM toks WHERE len(t) >= 3),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
        |s3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total3,
        |  COUNT(*) AS dist3, CAST(MAX(c) AS BIGINT) AS mx3
        |  FROM c3 GROUP BY doc_id)
        |SELECT d.doc_id,
        | COALESCE(total2, 0) AS n_2grams,
        | CASE WHEN COALESCE(total2, 0) > 0
        |   THEN CAST(total2 - dist2 AS DOUBLE) / CAST(total2 AS DOUBLE)
        |   ELSE CAST(0 AS DOUBLE) END AS dup_2gram_frac,
        | CASE WHEN COALESCE(total2, 0) > 0
        |   THEN CAST(mx2 AS DOUBLE) / CAST(total2 AS DOUBLE)
        |   ELSE CAST(0 AS DOUBLE) END AS top_2gram_frac,
        | COALESCE(total3, 0) AS n_3grams,
        | CASE WHEN COALESCE(total3, 0) > 0
        |   THEN CAST(total3 - dist3 AS DOUBLE) / CAST(total3 AS DOUBLE)
        |   ELSE CAST(0 AS DOUBLE) END AS dup_3gram_frac,
        | CASE WHEN COALESCE(total3, 0) > 0
        |   THEN CAST(mx3 AS DOUBLE) / CAST(total3 AS DOUBLE)
        |   ELSE CAST(0 AS DOUBLE) END AS top_3gram_frac
        |FROM documents d
        | LEFT JOIN s2 ON s2.doc_id = d.doc_id
        | LEFT JOIN s3 ON s3.doc_id = d.doc_id""".stripMargin,
    "vocabulary" ->
      """SELECT token, COUNT(*) AS n_occurrences,
        | COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY token HAVING COUNT(*) >= 5""".stripMargin,
    "vocab_stats" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT source, token, COUNT(*) AS cnt FROM tok GROUP BY source, token)
        |SELECT source,
        |  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  CAST(COUNT(CASE WHEN cnt = 1 THEN 1 END) AS BIGINT) AS n_hapax
        |FROM c GROUP BY source""".stripMargin,
    "tfidf_topterms" ->
      // tf*(N+1) stays exact in BIGINT; the single division by (df+1)
      // is the one shared rounding — same bits in both engines
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, token, tf, df,
        |  CAST(tf * (n_docs + 1) AS DOUBLE) / (df + 1) AS score
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |SELECT doc_id, token, tf, df, score, CAST(rank AS INT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, token ASC) AS rank FROM s)
        |WHERE rank <= 3""".stripMargin,
    // BM25 rational-idf index: e0-suffixed literals force DOUBLE (a bare
    // 1.2 is DECIMAL(2,1) in DuckDB and would round differently); op
    // order mirrors Bm25.bm25Index subexpression for subexpression, and
    // SUM(tf) is cast back to BIGINT before use (HUGEINT lesson).
    "bm25_index" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
        |  CAST((SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS DOUBLE)
        |   / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl)
        |SELECT doc_id, token, tf, dl, df,
        | ((CAST(n_docs - df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0))
        |  * ((CAST(tf AS DOUBLE) * (1.2e0 + 1.0e0)) /
        |     (CAST(tf AS DOUBLE)
        |      + 1.2e0 * ((1.0e0 - 0.75e0)
        |                 + (0.75e0 * CAST(dl AS DOUBLE)) / avgdl))) AS score
        |FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
        |CROSS JOIN stats""".stripMargin,
    // BM25 search over the rational index: same index SQL, then the
    // query-term join and a PORTABLE score sum — list_reduce over the
    // ascending-sorted score list folds left exactly like Spark's
    // aggregate(sort_array(collect_list(...))), making the double
    // additions order-identical (0.0 + x == x in IEEE, so the differing
    // initial accumulator is immaterial)
    "bm25_search_rational" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
        |  CAST((SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS DOUBLE)
        |   / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl),
        |idx AS (SELECT doc_id, token,
        | ((CAST(n_docs - df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0))
        |  * ((CAST(tf AS DOUBLE) * (1.2e0 + 1.0e0)) /
        |     (CAST(tf AS DOUBLE)
        |      + 1.2e0 * ((1.0e0 - 0.75e0)
        |                 + (0.75e0 * CAST(dl AS DOUBLE)) / avgdl))) AS score
        | FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
        | CROSS JOIN stats),
        |q(query_id, qtext) AS (VALUES
        |  (CAST(91 AS BIGINT), 'fast hash join'), (92, 'vector scan'),
        |  (93, 'slow merge sort'), (94, 'customer quantum')),
        |qt AS (SELECT DISTINCT query_id, token FROM
        |  (SELECT query_id, unnest(string_split(qtext, ' ')) AS token FROM q)),
        |m AS (SELECT query_id, doc_id, COUNT(*) AS n_matched,
        |  list_reduce(list_sort(LIST(score)), (a, b) -> a + b) AS bm25
        | FROM idx JOIN qt USING (token) GROUP BY 1, 2)
        |SELECT query_id, doc_id, n_matched, bm25, CAST(rank AS INT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY bm25 DESC, doc_id ASC) AS rank FROM m)
        |WHERE rank <= 10""".stripMargin,
    // hybrid RRF: the bm25_search_rational and cosine_topk oracle
    // fragments (both proven hash-exact) as arms at k=20 over the
    // joined query set, fused by exact integer division — 1000000000 //
    // (60 + rank) summed as BIGINT mirrors Spark's `div` + long sum
    "hybrid_rrf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
        |  CAST((SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS DOUBLE)
        |   / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl),
        |idx AS (SELECT doc_id, token,
        | ((CAST(n_docs - df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0))
        |  * ((CAST(tf AS DOUBLE) * (1.2e0 + 1.0e0)) /
        |     (CAST(tf AS DOUBLE)
        |      + 1.2e0 * ((1.0e0 - 0.75e0)
        |                 + (0.75e0 * CAST(dl AS DOUBLE)) / avgdl))) AS score
        | FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
        | CROSS JOIN stats),
        |q AS (SELECT d.doc_id AS query_id, d.text AS qtext,
        |    CAST(e.embedding AS DOUBLE[]) AS qv
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |  WHERE d.doc_id % 100 = 0 AND d.doc_id < 6400),
        |qt AS (SELECT DISTINCT query_id, token FROM
        |  (SELECT query_id, unnest(string_split(qtext, ' ')) AS token FROM q)),
        |m AS (SELECT query_id, doc_id, COUNT(*) AS n_matched,
        |  list_reduce(list_sort(LIST(score)), (a, b) -> a + b) AS bm25
        | FROM idx JOIN qt USING (token) GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id AS id, rank FROM (
        |  SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY bm25 DESC, doc_id ASC) AS rank FROM m)
        | WHERE rank <= 20),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings),
        |s AS (SELECT query_id, nid AS id,
        |  list_inner_product(qv, cv) /
        |   (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cosine
        |  FROM q CROSS JOIN c),
        |dense AS (SELECT query_id, id, rank FROM (
        |  SELECT query_id, id, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, id ASC) AS rank FROM s)
        | WHERE rank <= 20),
        |u AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
        |f AS (SELECT query_id, id, CAST(COUNT(*) AS BIGINT) AS n_arms,
        |  CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_score
        | FROM u GROUP BY 1, 2)
        |SELECT query_id, id, n_arms, rrf_score, CAST(rank AS INT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |  ORDER BY rrf_score DESC, id ASC) AS rank FROM f)
        |WHERE rank <= 10""".stripMargin,
    "doc_bigram_stats" ->
      // exact-integer projection of the bigram-LM scores, same HUGEINT
      // and single-division rules as doc_unigram_stats; bigrams via the
      // same 1-based inclusive list slices as the dedup_clusters oracle
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id,
        |   unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS gram
        | FROM toks WHERE len(t) >= 2),
        |tf AS (SELECT doc_id, gram, COUNT(*) AS tf FROM bg GROUP BY 1, 2),
        |cf AS (SELECT gram, CAST(SUM(tf) AS BIGINT) AS cf2 FROM tf GROUP BY 1)
        |SELECT doc_id,
        | CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        | CAST(SUM(tf * cf2) AS BIGINT) AS sum_freq,
        | MIN(cf2) AS min_freq,
        | CAST(SUM(tf * cf2) AS DOUBLE) / CAST(SUM(tf) AS BIGINT) AS mean_freq
        |FROM tf JOIN cf USING (gram)
        |GROUP BY doc_id""".stripMargin,
    "dsir_weights" ->
      // DSIR hashed-ngram importance stats: same md5 60-bit bucket as
      // the Spark portable path (('0x'||15 hex)::BIGINT is exact), the
      // integer columns cast back to BIGINT (HUGEINT rule), and the two
      // ratio columns each a single IEEE division over exact longs
      (dsirWeightsSql +
      """SELECT doc_id,
        | CAST(SUM(c) AS BIGINT) AS n_grams,
        | COUNT(*) AS n_feats,
        | CAST(SUM(c * cnt_t) AS BIGINT) AS sum_target_freq,
        | CAST(SUM(c * cnt_r) AS BIGINT) AS sum_raw_freq,
        | MIN(cnt_t) AS min_target_freq,
        | CAST(SUM(c * cnt_t) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
        |   AS mean_target_freq,
        | CAST(SUM(c * cnt_t) AS DOUBLE) /
        |   (CAST(SUM(c * cnt_r) AS BIGINT) + 1) AS target_ratio
        |FROM rf JOIN model USING (bucket)
        |GROUP BY doc_id""".stripMargin),
    "dsir_select" ->
      (dsirWeightsSql +
      """, w AS (SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_grams,
        |  CAST(SUM(c * cnt_t) AS DOUBLE) /
        |    (CAST(SUM(c * cnt_r) AS BIGINT) + 1) AS target_ratio
        | FROM rf JOIN model USING (bucket)
        | GROUP BY doc_id)
        |SELECT doc_id, n_grams, target_ratio FROM w
        |ORDER BY target_ratio DESC, doc_id ASC
        |LIMIT 200""".stripMargin),
    "doc_unigram_stats" ->
      // exact-integer projection of the unigram-LM scores; every SUM is
      // cast back to BIGINT (DuckDB widens SUM(BIGINT) to HUGEINT and
      // the driver hashes typed cells — the corpus_mixture lesson);
      // mean_freq is the one shared IEEE division
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |cf AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
        |SELECT doc_id,
        | CAST(SUM(tf) AS BIGINT) AS n_tokens,
        | CAST(SUM(tf * cf) AS BIGINT) AS sum_freq,
        | MIN(cf) AS min_freq,
        | CAST(SUM(tf * cf) AS DOUBLE) / CAST(SUM(tf) AS BIGINT) AS mean_freq
        |FROM tf JOIN cf USING (token)
        |GROUP BY doc_id""".stripMargin,
    // deterministic tie-break (count DESC, token ASC) mirrors the Spark
    // query's re-rank of the approx_top_k sketch output — exact while
    // the vocabulary fits the sketch's maxItemsTracked
    "vocabulary_topk" ->
      """SELECT token, COUNT(*) AS n_occurrences
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY n_occurrences DESC, token ASC
        |LIMIT 10""".stripMargin,
    "cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 3200),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid AS query_id, nid AS neighbor_id,
        |  list_inner_product(qv, cv) /
        |   (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cosine
        |  FROM q CROSS JOIN c WHERE qid <> nid)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
        | SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |   ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
        |WHERE rank <= 10""".stripMargin,
    "hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
        |  label AS ql FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 3200),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv,
        |  label AS nl FROM embeddings),
        |s AS (SELECT qid AS anchor_id, nid AS neighbor_id, nl AS neg_label,
        |  list_inner_product(qv, cv) /
        |   (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cosine
        |  FROM q CROSS JOIN c WHERE qid <> nid AND ql <> nl)
        |SELECT anchor_id, neighbor_id, neg_label, cosine,
        |  CAST(rank AS INT) AS neg_rank FROM (
        | SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
        |   ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
        |WHERE rank <= 5""".stripMargin,
    "retrieval_label_precision" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 3200),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid AS query_id, nid AS neighbor_id,
        |  list_inner_product(qv, cv) /
        |   (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS cosine
        |  FROM q CROSS JOIN c WHERE qid <> nid),
        |top AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
        |  WHERE rank <= 10)
        |SELECT t.query_id, ql.label, CAST(count(*) AS BIGINT) AS n_top,
        |  CAST(sum(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label
        |FROM top t
        |JOIN embeddings ql ON ql.vec_id = t.query_id
        |JOIN embeddings nl ON nl.vec_id = t.neighbor_id
        |GROUP BY t.query_id, ql.label""".stripMargin,
    "embed_near_dup_exact" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 1000)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | list_inner_product(a.e, b.e) /
        |  (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.e, b.e) /
        |  (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) >= 0.5""".stripMargin,
    // Cross-set contamination exact twin: same list-cosine kernel, the
    // join asymmetric (train = label<>0, eval = label=0) instead of the
    // id_a < id_b self-pair triangle.
    "semantic_contamination_exact" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings WHERE vec_id < 1000)
        |SELECT a.vec_id AS train_id, b.vec_id AS eval_id,
        | list_inner_product(a.e, b.e) /
        |  (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) AS cosine
        |FROM v a JOIN v b ON a.label <> 0 AND b.label = 0
        |WHERE list_inner_product(a.e, b.e) /
        |  (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) >= 0.35""".stripMargin,
    // The SRP LSH path verifies its candidates with the exact cosine
    // kernel and recovers the full exact pair set at its operating point
    // (DedupSpec recall test), so it is held to the SAME exact oracle.
    "embed_near_dup_srp" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | list_inner_product(a.e, b.e) /
        |  (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.e, b.e) /
        |  (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) >= 0.5""".stripMargin,
    // SemDeDup exact twin: list-cosine pair graph (embed_near_dup
    // pattern) + the recursive-CTE reach from dedup_clusters; survivors
    // are rows whose min reachable component id is their own id.
    "semantic_prune_exact" ->
      """WITH RECURSIVE
        |emb AS (SELECT * FROM embeddings WHERE vec_id < 1000),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM emb),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_inner_product(a.e, b.e) /
        |   (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) >= 0.4),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, comp) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT e.t, r.comp FROM reach r JOIN edges e ON e.s = r.id),
        |labels AS (SELECT emb.vec_id, COALESCE(MIN(r.comp), emb.vec_id) AS component
        |  FROM emb LEFT JOIN reach r ON r.id = emb.vec_id
        |  GROUP BY emb.vec_id)
        |SELECT e.vec_id, e.label FROM emb e
        |JOIN labels l ON l.vec_id = e.vec_id
        |WHERE l.component = e.vec_id""".stripMargin,
    "media_meta" ->
      // the twin recomputes the encoded dims arithmetically; the Spark
      // side reports what ImageIO DECODED from real PNG bytes — a hash
      // match proves the codec round trip, not just the projection
      """SELECT doc_id AS asset_id,
        | CAST(doc_id % 13 + 4 AS BIGINT) AS width,
        | CAST(doc_id % 11 + 3 AS BIGINT) AS height,
        | CAST(3 AS BIGINT) AS channels,
        | CAST((doc_id % 13 + 4) * (doc_id % 11 + 3) AS BIGINT) AS n_pixels
        |FROM documents""".stripMargin,
    "media_pixel_stats" ->
      // arithmetic recompute of the synthetic pixel function summed over
      // the raster — equals the Spark side only because PNG is lossless
      """SELECT d.doc_id AS asset_id,
        | CAST((d.doc_id % 13 + 4) * (d.doc_id % 11 + 3) AS BIGINT) AS n_pixels,
        | CAST(SUM((d.doc_id * 31 + x.x * 7 + y.y * 13) % 256) AS BIGINT) AS sum_r,
        | CAST(SUM((d.doc_id * 31 + x.x * 7 + y.y * 13 + 101) % 256) AS BIGINT) AS sum_g,
        | CAST(SUM((d.doc_id * 31 + x.x * 7 + y.y * 13 + 202) % 256) AS BIGINT) AS sum_b
        |FROM documents d,
        | unnest(range(0, CAST(d.doc_id % 13 + 4 AS INT))) AS x(x),
        | unnest(range(0, CAST(d.doc_id % 11 + 3 AS INT))) AS y(y)
        |GROUP BY d.doc_id""".stripMargin,
    "media_grid_features" ->
      // arithmetic recompute of the grid-cell gray sums and the
      // single-division means over the synthetic pixel function
      """SELECT d.doc_id AS asset_id,
        | CAST((x.x * 2) // (d.doc_id % 13 + 4) AS INT) AS cell_x,
        | CAST((y.y * 2) // (d.doc_id % 11 + 3) AS INT) AS cell_y,
        | CAST(COUNT(*) AS BIGINT) AS n_px,
        | CAST(SUM(((d.doc_id * 31 + x.x * 7 + y.y * 13) % 256)
        |        + ((d.doc_id * 31 + x.x * 7 + y.y * 13 + 101) % 256)
        |        + ((d.doc_id * 31 + x.x * 7 + y.y * 13 + 202) % 256)) AS BIGINT) AS sum_gray,
        | CAST(SUM(((d.doc_id * 31 + x.x * 7 + y.y * 13) % 256)
        |        + ((d.doc_id * 31 + x.x * 7 + y.y * 13 + 101) % 256)
        |        + ((d.doc_id * 31 + x.x * 7 + y.y * 13 + 202) % 256)) AS DOUBLE)
        |   / (3.0 * COUNT(*)) AS mean_gray
        |FROM documents d,
        | unnest(range(0, CAST(d.doc_id % 13 + 4 AS INT))) AS x(x),
        | unnest(range(0, CAST(d.doc_id % 11 + 3 AS INT))) AS y(y)
        |GROUP BY 1, 2, 3""".stripMargin,
    "image_near_dup" ->
      // full arithmetic recompute of the variant corpus (originals +
      // re-encode/crop/unrelated variants), the 3x3 centered grid-sum
      // vectors and the integer-exact cosine>=999/1000 verdict — every
      // value integral, so the comparison is bit-decisive
      """WITH anchors AS (SELECT doc_id FROM documents
        |  WHERE doc_id % 8 = 0 AND doc_id < 512),
        |imgs AS (
        |  SELECT doc_id AS img_id, doc_id AS seed, doc_id % 13 + 4 AS w,
        |      doc_id % 11 + 3 AS h, 0 AS dx, 0 AS dy FROM anchors
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    CASE WHEN (doc_id % 24) // 8 = 2 THEN doc_id + 7777
        |         ELSE doc_id END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN doc_id % 13 + 3
        |         ELSE doc_id % 13 + 4 END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN doc_id % 11 + 2
        |         ELSE doc_id % 11 + 3 END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN 1 ELSE 0 END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN 1 ELSE 0 END
        |  FROM anchors),
        |sums AS (SELECT i.img_id,
        |    ((y.y * 3) // i.h) * 3 + (x.x * 3) // i.w AS cell,
        |    SUM( (i.seed * 31 + (x.x + i.dx) * 7 + (y.y + i.dy) * 13) % 256
        |       + (i.seed * 31 + (x.x + i.dx) * 7 + (y.y + i.dy) * 13 + 101) % 256
        |       + (i.seed * 31 + (x.x + i.dx) * 7 + (y.y + i.dy) * 13 + 202) % 256
        |       ) AS s
        |  FROM imgs i, unnest(range(0, i.w)) AS x(x),
        |       unnest(range(0, i.h)) AS y(y)
        |  GROUP BY 1, 2),
        |grid AS (SELECT i.img_id, c.c AS cell, COALESCE(s.s, 0) AS s
        |  FROM imgs i CROSS JOIN unnest(range(0, 9)) AS c(c)
        |  LEFT JOIN sums s ON s.img_id = i.img_id AND s.cell = c.c),
        |tot AS (SELECT img_id, SUM(s) AS st FROM grid GROUP BY 1),
        |v AS (SELECT g.img_id, g.cell, CAST(9 * g.s - t.st AS HUGEINT) AS c
        |  FROM grid g JOIN tot t ON t.img_id = g.img_id),
        |norms AS (SELECT img_id, SUM(c * c) AS nn FROM v GROUP BY 1),
        |dots AS (SELECT a.img_id AS ia, b.img_id AS ib, SUM(a.c * b.c) AS dot
        |  FROM v a JOIN v b ON a.cell = b.cell AND a.img_id < b.img_id
        |  GROUP BY 1, 2)
        |SELECT d.ia AS asset_a, d.ib AS asset_b, CAST(d.dot AS BIGINT) AS dot,
        |  (d.dot > 0 AND d.dot * d.dot * 1000000 >= 998001 * na.nn * nb.nn)
        |    AS is_dup
        |FROM dots d JOIN norms na ON na.img_id = d.ia
        |JOIN norms nb ON nb.img_id = d.ib""".stripMargin,
    "image_near_dup_lsh" ->
      // the scale arm answers the exact arm's DUPLICATE SET: banding
      // cannot drop an identical-vector pair (equal codes in every
      // band) and the verify is the same integer-exact decision
      """WITH anchors AS (SELECT doc_id FROM documents
        |  WHERE doc_id % 8 = 0 AND doc_id < 512),
        |imgs AS (
        |  SELECT doc_id AS img_id, doc_id AS seed, doc_id % 13 + 4 AS w,
        |      doc_id % 11 + 3 AS h, 0 AS dx, 0 AS dy FROM anchors
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    CASE WHEN (doc_id % 24) // 8 = 2 THEN doc_id + 7777
        |         ELSE doc_id END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN doc_id % 13 + 3
        |         ELSE doc_id % 13 + 4 END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN doc_id % 11 + 2
        |         ELSE doc_id % 11 + 3 END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN 1 ELSE 0 END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN 1 ELSE 0 END
        |  FROM anchors),
        |sums AS (SELECT i.img_id,
        |    ((y.y * 3) // i.h) * 3 + (x.x * 3) // i.w AS cell,
        |    SUM( (i.seed * 31 + (x.x + i.dx) * 7 + (y.y + i.dy) * 13) % 256
        |       + (i.seed * 31 + (x.x + i.dx) * 7 + (y.y + i.dy) * 13 + 101) % 256
        |       + (i.seed * 31 + (x.x + i.dx) * 7 + (y.y + i.dy) * 13 + 202) % 256
        |       ) AS s
        |  FROM imgs i, unnest(range(0, i.w)) AS x(x),
        |       unnest(range(0, i.h)) AS y(y)
        |  GROUP BY 1, 2),
        |grid AS (SELECT i.img_id, c.c AS cell, COALESCE(s.s, 0) AS s
        |  FROM imgs i CROSS JOIN unnest(range(0, 9)) AS c(c)
        |  LEFT JOIN sums s ON s.img_id = i.img_id AND s.cell = c.c),
        |tot AS (SELECT img_id, SUM(s) AS st FROM grid GROUP BY 1),
        |v AS (SELECT g.img_id, g.cell, CAST(9 * g.s - t.st AS HUGEINT) AS c
        |  FROM grid g JOIN tot t ON t.img_id = g.img_id),
        |norms AS (SELECT img_id, SUM(c * c) AS nn FROM v GROUP BY 1),
        |dots AS (SELECT a.img_id AS ia, b.img_id AS ib, SUM(a.c * b.c) AS dot
        |  FROM v a JOIN v b ON a.cell = b.cell AND a.img_id < b.img_id
        |  GROUP BY 1, 2)
        |SELECT d.ia AS asset_a, d.ib AS asset_b, CAST(d.dot AS BIGINT) AS dot
        |FROM dots d JOIN norms na ON na.img_id = d.ia
        |JOIN norms nb ON nb.img_id = d.ib
        |WHERE d.dot > 0
        |  AND d.dot * d.dot * 1000000 >= 998001 * na.nn * nb.nn""".stripMargin,
    "media_video_frames" ->
      // arithmetic recompute of the sampled-frame coverage, dims and
      // per-channel sums; the Spark side demuxes real PNG frames
      """SELECT d.doc_id AS asset_id, CAST(f.f AS INT) AS frame_idx,
        | CAST(6 AS INT) AS width, CAST(4 AS INT) AS height,
        | CAST(SUM(((d.doc_id * 1009 + f.f) * 31 + x.x * 7 + y.y * 13) % 256) AS BIGINT) AS sum_r,
        | CAST(SUM(((d.doc_id * 1009 + f.f) * 31 + x.x * 7 + y.y * 13 + 101) % 256) AS BIGINT) AS sum_g,
        | CAST(SUM(((d.doc_id * 1009 + f.f) * 31 + x.x * 7 + y.y * 13 + 202) % 256) AS BIGINT) AS sum_b
        |FROM documents d,
        | unnest(range(0, CAST(d.doc_id % 7 + 3 AS INT), 2)) AS f(f),
        | unnest(range(0, 6)) AS x(x),
        | unnest(range(0, 4)) AS y(y)
        |GROUP BY d.doc_id, f.f""".stripMargin,
    "video_near_dup" ->
      // arithmetic recompute of the sloped-pixel frame sums over the
      // sampled frames, the centered 3x3 signatures and the
      // integer-exact cosine>=9995/10000 verdict
      """WITH anchors AS (SELECT doc_id FROM documents
        |  WHERE doc_id % 8 = 0 AND doc_id < 512),
        |vids AS (
        |  SELECT doc_id AS vid_id, doc_id AS seed,
        |      doc_id % 7 + 3 AS nf FROM anchors
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    CASE WHEN (doc_id % 16) // 8 = 1 THEN doc_id + 7777
        |         ELSE doc_id END,
        |    doc_id % 7 + 3
        |  FROM anchors),
        |px AS (SELECT v.vid_id,
        |    ((y.y * 3) // 4) * 3 + (x.x * 3) // 6 AS cell,
        |    v.seed * 1009 + f.f AS fa, x.x AS x, y.y AS y
        |  FROM vids v,
        |    unnest(range(0, v.nf, 2)) AS f(f),
        |    unnest(range(0, 6)) AS x(x), unnest(range(0, 4)) AS y(y)),
        |sums AS (SELECT vid_id, cell,
        |    SUM( (fa * 31 + x * (fa % 7 + 3) + y * (fa % 11 + 5)) % 256
        |       + (fa * 31 + x * (fa % 7 + 3) + y * (fa % 11 + 5) + 101) % 256
        |       + (fa * 31 + x * (fa % 7 + 3) + y * (fa % 11 + 5) + 202) % 256
        |       ) AS s
        |  FROM px GROUP BY 1, 2),
        |tot AS (SELECT vid_id, SUM(s) AS st FROM sums GROUP BY 1),
        |v AS (SELECT g.vid_id, g.cell, CAST(9 * g.s - t.st AS HUGEINT) AS c
        |  FROM sums g JOIN tot t ON t.vid_id = g.vid_id),
        |norms AS (SELECT vid_id, SUM(c * c) AS nn FROM v GROUP BY 1),
        |dots AS (SELECT a.vid_id AS ia, b.vid_id AS ib, SUM(a.c * b.c) AS dot
        |  FROM v a JOIN v b ON a.cell = b.cell AND a.vid_id < b.vid_id
        |  GROUP BY 1, 2)
        |SELECT d.ia AS asset_a, d.ib AS asset_b, CAST(d.dot AS BIGINT) AS dot,
        |  (d.dot > 0 AND d.dot * d.dot * 100000000 >= 99900025 * na.nn * nb.nn)
        |    AS is_dup
        |FROM dots d JOIN norms na ON na.vid_id = d.ia
        |JOIN norms nb ON nb.vid_id = d.ib""".stripMargin,
    "media_audio_meta" ->
      // arithmetic recompute of the encoded clip shape; the Spark side
      // reports what javax.sound.sampled DECODED from real WAV bytes
      """SELECT doc_id AS asset_id,
        | CAST(doc_id % 97 + 40 AS BIGINT) AS n_samples,
        | CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(1 AS BIGINT) AS channels,
        | CAST(16 AS BIGINT) AS bits
        |FROM documents""".stripMargin,
    "media_audio_stats" ->
      // arithmetic recompute of the synthetic PCM sample function,
      // aggregated — equals the Spark side only because 16-bit PCM is
      // lossless through the WAV container
      """SELECT d.doc_id AS asset_id,
        | CAST(doc_id % 97 + 40 AS BIGINT) AS n_samples,
        | CAST(SUM((d.doc_id * 31 + k.k * 7) % 4096 - 2048) AS BIGINT) AS sum_pcm,
        | CAST(SUM(abs((d.doc_id * 31 + k.k * 7) % 4096 - 2048)) AS BIGINT) AS sum_abs,
        | CAST(MIN((d.doc_id * 31 + k.k * 7) % 4096 - 2048) AS BIGINT) AS min_pcm,
        | CAST(MAX((d.doc_id * 31 + k.k * 7) % 4096 - 2048) AS BIGINT) AS max_pcm
        |FROM documents d,
        | unnest(range(0, CAST(d.doc_id % 97 + 40 AS INT))) AS k(k)
        |GROUP BY d.doc_id""".stripMargin,
    "media_audio_features" ->
      // arithmetic recompute of the 16-frame windowed energy contour —
      // exact long window sums, one IEEE division per window
      """SELECT d.doc_id AS asset_id, CAST(k.k // 16 AS INT) AS win_idx,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM((d.doc_id * 31 + k.k * 7) % 4096 - 2048) AS BIGINT)
        |   AS sum_pcm,
        | CAST(SUM(((d.doc_id * 31 + k.k * 7) % 4096 - 2048)
        |        * ((d.doc_id * 31 + k.k * 7) % 4096 - 2048)) AS BIGINT)
        |   AS sum_sq,
        | CAST(SUM(((d.doc_id * 31 + k.k * 7) % 4096 - 2048)
        |        * ((d.doc_id * 31 + k.k * 7) % 4096 - 2048)) AS DOUBLE)
        |   / COUNT(*) AS energy
        |FROM documents d,
        | unnest(range(0, CAST(d.doc_id % 97 + 40 AS INT))) AS k(k)
        |GROUP BY 1, 2""".stripMargin,
    "audio_near_dup" ->
      // full arithmetic recompute of the chirp-clip variant corpus, the
      // 12-cell centered contour vectors and the integer-exact
      // cosine>=99/100 verdict (the audio image_near_dup twin)
      """WITH anchors AS (SELECT doc_id FROM documents
        |  WHERE doc_id % 8 = 0 AND doc_id < 512),
        |clips AS (
        |  SELECT doc_id AS clip_id, doc_id AS seed, doc_id % 97 + 40 AS n
        |  FROM anchors
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    CASE WHEN (doc_id % 24) // 8 = 2 THEN doc_id + 7777
        |         ELSE doc_id END,
        |    CASE WHEN (doc_id % 24) // 8 = 1 THEN ((doc_id % 97 + 40) * 4) // 5
        |         ELSE doc_id % 97 + 40 END
        |  FROM anchors),
        |sums AS (SELECT c.clip_id, (k.k * 12) // c.n AS cell,
        |    SUM((c.seed * 31 + (c.seed % 13 + 2) * k.k * k.k + 7 * k.k)
        |        % 4096 - 2048) AS s
        |  FROM clips c, unnest(range(0, c.n)) AS k(k)
        |  GROUP BY 1, 2),
        |grid AS (SELECT c.clip_id, x.x AS cell, COALESCE(s.s, 0) AS s
        |  FROM clips c CROSS JOIN unnest(range(0, 12)) AS x(x)
        |  LEFT JOIN sums s ON s.clip_id = c.clip_id AND s.cell = x.x),
        |tot AS (SELECT clip_id, SUM(s) AS st FROM grid GROUP BY 1),
        |v AS (SELECT g.clip_id, g.cell, CAST(12 * g.s - t.st AS HUGEINT) AS c
        |  FROM grid g JOIN tot t ON t.clip_id = g.clip_id),
        |norms AS (SELECT clip_id, SUM(c * c) AS nn FROM v GROUP BY 1),
        |dots AS (SELECT a.clip_id AS ia, b.clip_id AS ib,
        |    SUM(a.c * b.c) AS dot
        |  FROM v a JOIN v b ON a.cell = b.cell AND a.clip_id < b.clip_id
        |  GROUP BY 1, 2)
        |SELECT d.ia AS asset_a, d.ib AS asset_b, CAST(d.dot AS BIGINT) AS dot,
        |  (d.dot > 0 AND d.dot * d.dot * 10000 >= 9801 * na.nn * nb.nn)
        |    AS is_dup
        |FROM dots d JOIN norms na ON na.clip_id = d.ia
        |JOIN norms nb ON nb.clip_id = d.ib""".stripMargin,
    "media_resize_image" ->
      // resampled dims are the target by contract (in-plan gated); the
      // oracle pins the projection and the every-10th-doc coverage
      """SELECT doc_id AS asset_id,
        | CAST(8 AS BIGINT) AS width,
        | CAST(6 AS BIGINT) AS height,
        | CAST(3 AS BIGINT) AS channels
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,
    "media_frames" ->
      """SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_idx,
        | hex(encode(substring(text, CAST(i * 16 + 1 AS INT), 16))) AS frame
        |FROM documents, unnest(range(0, strlen(text) // 16, 4)) AS u(i)""".stripMargin,
    "media_features" ->
      """SELECT doc_id AS asset_id, CAST(i AS INT) AS feature_idx,
        | CAST(ord(substring(text, CAST(i % strlen(text) AS INT) + 1, 1)) AS DOUBLE)
        |   / 255.0 - 0.5 AS feature
        |FROM documents, unnest(range(0, 8)) AS u(i)
        |WHERE strlen(text) > 0""".stripMargin,
    "media_resize" ->
      // crop/pad in hex space: hex of the first 64 payload bytes, then
      // '00' pairs for the zero padding
      """SELECT doc_id AS asset_id,
        | hex(encode(substring(text, 1, 64)))
        |   || repeat('00', CAST(greatest(64 - strlen(text), 0) AS INT)) AS resized_hex
        |FROM documents""".stripMargin,
    "text_scrub" ->
      """SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(
        |   text || ' contact user' || CAST(doc_id AS VARCHAR)
        |        || '@mail.example.com ref 1234567890 via https://ex.com/d/'
        |        || CAST(doc_id AS VARCHAR),
        |   'https?://[^ ]+', '<URL>', 'g'),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{6,}', '<NUM>', 'g') AS scrubbed
        |FROM documents""".stripMargin,
    "pii_density" ->
      """WITH d AS (SELECT source,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |       || '@mail.example.com ref 1234567890 via https://ex.com/d/'
        |       || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(t, 'https?://[^ ]+'))) AS BIGINT) AS n_urls,
        |  CAST(sum(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
        |  CAST(sum(len(regexp_extract_all(t, '[0-9]{6,}'))) AS BIGINT) AS n_numbers
        |FROM d GROUP BY source""".stripMargin,
    "contamination" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source, sh FROM (
        |  SELECT doc_id, source,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contam
        |FROM sh s JOIN ev USING (sh)
        |WHERE s.source <> 'src0'
        |GROUP BY s.doc_id""".stripMargin,
    // the Bloom pre-filter admits no false negatives and the exact join
    // runs after it, so the bloom path answers to the IDENTICAL oracle
    "contamination_bloom" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source, sh FROM (
        |  SELECT doc_id, source,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contam
        |FROM sh s JOIN ev USING (sh)
        |WHERE s.source <> 'src0'
        |GROUP BY s.doc_id""".stripMargin,
    "label_centroids" ->
      // micro-unit quantization makes the element sums integral, hence
      // exact and order-independent in both engines (see the query doc)
      """SELECT label, COUNT(*) AS n_vectors,
        | SUM(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5))
        |   / 1000000.0 / COUNT(*) AS c0,
        | SUM(floor(CAST(embedding[64] AS DOUBLE) * 1000000.0 + 0.5))
        |   / 1000000.0 / COUNT(*) AS c63
        |FROM embeddings GROUP BY label""".stripMargin,
    "embed_quantize" ->
      """SELECT vec_id,
        | array_to_string(
        |   [CAST(CAST(floor(CAST(x AS DOUBLE) * CAST(127 AS DOUBLE) / mx + 0.5) AS TINYINT) AS VARCHAR)
        |    FOR x IN embedding], ',') AS q_csv,
        | mx / CAST(127 AS DOUBLE) AS scale
        |FROM (SELECT vec_id, embedding,
        |       greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]),
        |                CAST(1e-30 AS DOUBLE)) AS mx
        |      FROM embeddings)""".stripMargin
  )
}
