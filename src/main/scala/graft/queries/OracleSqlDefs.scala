package graft.queries

/** Generated/derived DuckDB oracle SQL builders shared by the
  * [[graft.SparkEntry.oracleSql]] registry slices (mechanical split
  * from SparkEntry.scala; bodies verbatim).
  */
private[graft] object OracleSqlDefs {

  /** Generated oracle for gopher_repetition_flags: one explode+groupBy
    * CTE per n (the shuffle-heavy formulation of the zero-shuffle
    * kernel); totals derive from len(t) - n + 1 so gram-less docs fall
    * out as fraction 0 / rule passed, matching the kernel's [0,0,0].
    * Thresholds are [[graft.operators.Quality]]'s paper defaults —
    * generated from the SAME constants, so the twin can't drift.
    */
  /** DuckDB list of the k=3 portable Bloom bit positions for `x`
    * (must render an already-VARCHAR expression) at mBits=4096 —
    * mirrors `BloomIndex.positions`.
    */
  private[graft] def bloomPosListSql(x: String): String =
    (0 until 3).map(i =>
      s"('0x' || substr(md5($x || '#bloom$i'), 1, 15))::BIGINT % 4096")
      .mkString("[", ",\n           ", "]")

  /** The four-column orders profile rebuilt in DuckDB — shared by
    * `table_profile` and (as a CTE) `dq_suggest`, whose rule
    * derivation replays over exactly this frame.
    */
  private[graft] def ordersProfileOracleSql: String = {
    // the profile's data_type is a Spark schema literal; the oracle
    // pins the expected names (orders: int64 -> bigint, utf8 -> string)
    val sparkTypes = Map(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_orderpriority" -> "string")
    def one(c: String): String =
      s"""SELECT '$c' AS column_name,
         |  '${sparkTypes(c)}' AS data_type,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count($c) AS BIGINT) AS n_nonnull,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value,
         |  CAST(sum(length(CAST($c AS VARCHAR))) AS DOUBLE) / count($c) AS avg_len,
         |  (count($c) = count(*) AND count(DISTINCT $c) = count(*)) AS is_candidate_key
         |FROM orders""".stripMargin
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map(one).mkString("\nUNION ALL\n")
  }

  /** The integer-grid k-means fit (`integerLloydAssigned`) unrolled as
    * DuckDB CTEs — quantize, md5-rank init, two assign/update rounds
    * with exact floor-average centroids and empty-cluster carry — in
    * exact integer arithmetic, ending with `asg(vec_id, q, list_id,
    * dist)` = the final assignment. Shared by the three portable
    * oracles (`kmeans_profile_portable`, `d4_prototype_prune_portable`,
    * `semantic_prune_portable`); no leading WITH so callers can extend
    * the chain.
    */
  private[graft] def kmeansPortableCtesSql: String = {
    // one Lloyd round: assign to prevC, floor-average update, carry
    // empty clusters
    def round(i: Int, prevC: String): String =
      s"""a$i AS (
         |  SELECT v.vec_id, v.q, c.list_id,
         |         list_sum([(v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
         |                   for i in range(1, 65)]) AS dist
         |  FROM qv v CROSS JOIN $prevC c),
         |r$i AS (SELECT vec_id, q, list_id, dist,
         |               row_number() OVER (PARTITION BY vec_id
         |                                  ORDER BY dist, list_id) AS rn
         |        FROM a$i),
         |g$i AS (SELECT * FROM r$i WHERE rn = 1),
         |u$i AS (SELECT list_id, i AS d, sum(q[i]) AS sv, count(*) AS n
         |        FROM g$i, range(1, 65) t(i) GROUP BY 1, 2),
         |n$i AS (SELECT list_id,
         |               list(CAST((sv - (((sv % n) + n) % n)) / n AS BIGINT)
         |                    ORDER BY d) AS c
         |        FROM u$i GROUP BY 1),
         |c$i AS (SELECT p.list_id, coalesce(n$i.c, p.c) AS c
         |        FROM $prevC p LEFT JOIN n$i USING (list_id))""".stripMargin
    s"""qv AS (
       |  SELECT vec_id,
       |         [CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
       |          for x in embedding] AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |sd AS (SELECT q, md5(CAST(vec_id AS VARCHAR) || '#kp13') AS h
       |       FROM qv ORDER BY h LIMIT 8),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
       |              AS list_id, q AS c
       |       FROM sd),
       |${round(1, "c0")},
       |${round(2, "c1")},
       |a3 AS (
       |  SELECT v.vec_id, v.q, c.list_id,
       |         list_sum([(v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
       |                   for i in range(1, 65)]) AS dist
       |  FROM qv v CROSS JOIN c2 c),
       |r3 AS (SELECT vec_id, q, list_id, dist,
       |              row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, list_id) AS rn
       |       FROM a3),
       |asg AS (SELECT vec_id, q, list_id, dist FROM r3 WHERE rn = 1)""".stripMargin
  }

  private[graft] def kmeansPortableOracleSql: String =
    s"""WITH $kmeansPortableCtesSql
       |SELECT list_id, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(sum(dist) AS BIGINT) AS ssd
       |FROM asg
       |GROUP BY 1""".stripMargin

  /** `d4_prototype_prune_portable` over the shared assignment: the
    * window-rank drop of the floor(0.25·n) closest-to-centroid members
    * per cluster, ties to the lower vec_id.
    */
  private[graft] def d4PortableOracleSql: String =
    s"""WITH $kmeansPortableCtesSql,
       |rk AS (SELECT vec_id, list_id, dist,
       |              row_number() OVER (PARTITION BY list_id
       |                                 ORDER BY dist, vec_id) AS rn,
       |              count(*) OVER (PARTITION BY list_id) AS n
       |       FROM asg)
       |SELECT vec_id, list_id, CAST(dist AS BIGINT) AS dist
       |FROM rk WHERE rn > CAST(floor(0.25 * n) AS BIGINT)""".stripMargin

  /** `ann_ivf_topk_portable` over the shared fit: rank centroids per
    * pinned query, probe the 2 best lists, exact-distance top-10 with
    * (dist, vec_id) ties — the full IVF probe path in integer
    * arithmetic.
    */
  private[graft] def annIvfPortableOracleSql: String =
    s"""WITH $kmeansPortableCtesSql,
       |qs AS (SELECT vec_id AS query_id, q AS qq FROM asg
       |       WHERE vec_id < 64),
       |pd AS (
       |  SELECT qs.query_id, qs.qq, c.list_id,
       |         list_sum([(qs.qq[i] - c.c[i]) * (qs.qq[i] - c.c[i])
       |                   for i in range(1, 65)]) AS cdist
       |  FROM qs CROSS JOIN c2 c),
       |pr AS (SELECT query_id, qq, list_id,
       |              row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cdist, list_id) AS prn
       |       FROM pd),
       |probe AS (SELECT query_id, qq, list_id FROM pr WHERE prn <= 2),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |         list_sum([(p.qq[i] - a.q[i]) * (p.qq[i] - a.q[i])
       |                   for i in range(1, 65)]) AS dist
       |  FROM probe p JOIN asg a ON a.list_id = p.list_id),
       |rk AS (SELECT query_id, neighbor_id, CAST(dist AS BIGINT) AS dist,
       |              CAST(row_number() OVER (PARTITION BY query_id
       |                   ORDER BY dist, neighbor_id) AS INT) AS rank
       |       FROM cand)
       |SELECT query_id, neighbor_id, dist, rank FROM rk
       |WHERE rank <= 10""".stripMargin

  /** `pq_adc_portable` unrolled as DuckDB CTEs: per subspace j — slice,
    * md5-rank seeds, one exact Lloyd round with empty-code carry,
    * corpus encode, query-side distance table — then the ADC sum over
    * the m per-subspace parts and the (adc, vec_id)-ranked top 10.
    */
  private[graft] def pqAdcPortableOracleSql: String = {
    val m = 8; val sub = 8; val k = 4
    def dist(a: String, b: String): String =
      s"list_sum([($a[i] - $b[i]) * ($a[i] - $b[i]) for i in range(1, ${sub + 1})])"
    def subspace(j: Int): String = {
      val lo = j * sub + 1; val hi = (j + 1) * sub
      s"""sv$j AS (SELECT vec_id, list_slice(q, $lo, $hi) AS v FROM qv),
         |sd$j AS (SELECT v, md5(CAST(vec_id AS VARCHAR) || '#pq13s$j') AS h
         |         FROM sv$j ORDER BY h LIMIT $k),
         |k0$j AS (SELECT CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT)
         |                AS code, v AS c
         |         FROM sd$j),
         |pa$j AS (SELECT s.vec_id, s.v, c.code, ${dist("s.v", "c.c")} AS dist
         |         FROM sv$j s CROSS JOIN k0$j c),
         |pr$j AS (SELECT vec_id, v, code,
         |                row_number() OVER (PARTITION BY vec_id
         |                                   ORDER BY dist, code) AS rn
         |         FROM pa$j),
         |pu$j AS (SELECT code, i AS d, sum(v[i]) AS sx, count(*) AS n
         |         FROM pr$j, range(1, ${sub + 1}) t(i)
         |         WHERE rn = 1 GROUP BY 1, 2),
         |pn$j AS (SELECT code,
         |                list(CAST((sx - (((sx % n) + n) % n)) / n AS BIGINT)
         |                     ORDER BY d) AS c
         |         FROM pu$j GROUP BY 1),
         |k1$j AS (SELECT p.code, coalesce(pn$j.c, p.c) AS c
         |         FROM k0$j p LEFT JOIN pn$j USING (code)),
         |ea$j AS (SELECT s.vec_id, c.code, ${dist("s.v", "c.c")} AS dist
         |         FROM sv$j s CROSS JOIN k1$j c),
         |enc$j AS (SELECT vec_id, code FROM (
         |            SELECT vec_id, code,
         |                   row_number() OVER (PARTITION BY vec_id
         |                                      ORDER BY dist, code) AS rn
         |            FROM ea$j) WHERE rn = 1),
         |qd$j AS (SELECT s.vec_id AS query_id, c.code,
         |                ${dist("s.v", "c.c")} AS d
         |         FROM sv$j s CROSS JOIN k1$j c WHERE s.vec_id < 64),
         |part$j AS (SELECT qd.query_id, e.vec_id, qd.d
         |           FROM enc$j e JOIN qd$j qd USING (code))""".stripMargin
    }
    val union = (0 until m).map(j => s"SELECT * FROM part$j")
      .mkString("\n       UNION ALL ")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |         [CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
       |          for x in embedding] AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |${(0 until m).map(subspace).mkString(",\n")},
       |adc AS (SELECT query_id, vec_id, sum(d) AS adc
       |        FROM ($union)
       |        GROUP BY 1, 2),
       |rk AS (SELECT query_id, vec_id, CAST(adc AS BIGINT) AS adc,
       |              CAST(row_number() OVER (PARTITION BY query_id
       |                   ORDER BY adc, vec_id) AS INT) AS rank
       |       FROM adc)
       |SELECT query_id, vec_id AS neighbor_id, adc, rank FROM rk
       |WHERE rank <= 10""".stripMargin
  }

  /** `semantic_contamination_portable` over the shared assignment:
    * same-cluster train×eval pairs, the cross-multiplied integer
    * cosine-≥-0.35 test (400·dot² ≥ 49·|a|²·|b|²).
    */
  private[graft] def semanticContaminationPortableOracleSql: String =
    s"""WITH $kmeansPortableCtesSql,
       |al AS (SELECT asg.vec_id, asg.q, asg.list_id, e.label
       |       FROM asg JOIN embeddings e ON e.vec_id = asg.vec_id),
       |cand AS (
       |  SELECT a.vec_id AS train_id, b.vec_id AS eval_id,
       |         list_sum([a.q[i] * b.q[i] for i in range(1, 65)]) AS dp,
       |         list_sum([a.q[i] * a.q[i] for i in range(1, 65)]) AS na,
       |         list_sum([b.q[i] * b.q[i] for i in range(1, 65)]) AS nb
       |  FROM al a JOIN al b
       |    ON a.list_id = b.list_id AND a.label <> 0 AND b.label = 0)
       |SELECT train_id, eval_id, CAST(dp AS BIGINT) AS dp FROM cand
       |WHERE dp > 0 AND 400 * dp * dp >= 49 * na * nb""".stripMargin

  /** `semantic_prune_portable` over the shared assignment: same-cluster
    * candidate pairs, the cross-multiplied integer cosine-≥-0.4 test
    * (dot>0 ∧ 25·dot² ≥ 4·|a|²·|b|²), then the recursive min-reach CC
    * keep-one from `semantic_prune_exact`.
    */
  private[graft] def semanticPrunePortableOracleSql: String =
    s"""WITH RECURSIVE $kmeansPortableCtesSql,
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         list_sum([a.q[i] * b.q[i] for i in range(1, 65)]) AS dp,
       |         list_sum([a.q[i] * a.q[i] for i in range(1, 65)]) AS na,
       |         list_sum([b.q[i] * b.q[i] for i in range(1, 65)]) AS nb
       |  FROM asg a JOIN asg b
       |    ON a.list_id = b.list_id AND a.vec_id < b.vec_id),
       |pairs AS (SELECT id_a, id_b FROM cand
       |          WHERE dp > 0 AND 25 * dp * dp >= 4 * na * nb),
       |edges AS (SELECT id_a AS s, id_b AS t FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, comp) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.t, r.comp FROM reach r JOIN edges e ON e.s = r.id),
       |labels AS (SELECT asg.vec_id, COALESCE(MIN(r.comp), asg.vec_id)
       |                  AS component
       |  FROM asg LEFT JOIN reach r ON r.id = asg.vec_id
       |  GROUP BY asg.vec_id)
       |SELECT e.vec_id, e.label
       |FROM embeddings e
       |JOIN labels l ON l.vec_id = e.vec_id
       |WHERE e.embedding IS NOT NULL AND l.component = e.vec_id""".stripMargin

  /** The integer power iteration of `pca_power_portable` unrolled as
    * DuckDB CTEs: quantize, floor-mean center, three v' = Gᵀ(G v)
    * rounds in the Gram-free two-pass factorization, exact
    * floor-division rescaling, final per-row scores.
    */
  private[graft] def pcaPowerPortableOracleSql: String = {
    def round(i: Int, prevV: String): String =
      s"""s$i AS (SELECT vec_id, y,
         |               list_sum([y[i] * vv.v[i] for i in range(1, 65)]) AS s
         |        FROM yv, $prevV vv),
         |w$i AS (SELECT i AS d, sum(y[i] * s) AS w
         |        FROM s$i, range(1, 65) t(i) GROUP BY 1),
         |d$i AS (SELECT greatest(CAST(1 AS BIGINT),
         |                 CAST(((mx + 1023) - ((mx + 1023) % 1024)) / 1024
         |                      AS BIGINT)) AS dv
         |        FROM (SELECT CAST(max(abs(w)) AS BIGINT) AS mx FROM w$i)),
         |v$i AS (SELECT list(CAST((w - (((w % dv) + dv) % dv)) / dv
         |                         AS BIGINT) ORDER BY d) AS v
         |        FROM w$i, d$i)""".stripMargin
    s"""WITH qv AS (
       |  SELECT vec_id,
       |         [CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
       |          for x in embedding] AS q
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |mm AS (SELECT i AS d, sum(q[i]) AS sv, count(*) AS n
       |       FROM qv, range(1, 65) t(i) GROUP BY 1),
       |mv AS (SELECT list(CAST((sv - (((sv % n) + n) % n)) / n AS BIGINT)
       |                   ORDER BY d) AS m
       |       FROM mm),
       |yv AS (SELECT vec_id, [q[i] - mv.m[i] for i in range(1, 65)] AS y
       |       FROM qv, mv),
       |v0 AS (SELECT [CAST(1024 AS BIGINT) for i in range(1, 65)] AS v),
       |${round(1, "v0")},
       |${round(2, "v1")},
       |${round(3, "v2")}
       |SELECT vec_id,
       |       CAST(list_sum([y[i] * vv.v[i] for i in range(1, 65)])
       |            AS BIGINT) AS p1
       |FROM yv, v3 vv""".stripMargin
  }

  /** The hourly median/MAD anomaly verdict rebuilt in DuckDB — shared
    * by `event_anomalies` and `count_store_compaction` (the compacted
    * count store must serve exactly this).
    */
  private[graft] def eventAnomaliesOracleSql: String =
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
      |        FROM wm GROUP BY 1)
      |SELECT w.event_type, w.event_hour, w.cnt, w.med, d.mad,
      |       (w.adev > 3.0 * d.mad) AS is_anomaly
      |FROM wm w JOIN mad d ON w.event_type = d.event_type""".stripMargin

  /** The orders Bloom index rebuilt in DuckDB — shared by
    * `bloom_index_build` and `bloom_store_compaction` (the compacted
    * store must serve exactly this).
    */
  private[graft] def bloomBuildOracleSql: String =
    s"""WITH raw AS (
       |  SELECT o_orderkey // 256 AS chunk,
       |         unnest(${bloomPosListSql("CAST(o_custkey AS VARCHAR)")}) AS pos
       |  FROM orders WHERE o_custkey IS NOT NULL)
       |SELECT CAST(chunk AS BIGINT) AS chunk,
       |       CAST(pos // 63 AS BIGINT) AS word,
       |       bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bitmap
       |FROM raw GROUP BY 1, 2""".stripMargin

  private[graft] def gopherRepetitionSql: String = {
    import graft.operators.Quality
    val tops = Quality.GopherTopNgramThresholds
    val dups = Quality.GopherDupNgramThresholds
    val ctes = (tops ++ dups).map(_._1).map { n =>
      s"""r$n AS (SELECT doc_id, COUNT(*) AS dist, MAX(c) AS maxc FROM (
         |  SELECT doc_id, g, COUNT(*) AS c FROM (
         |    SELECT doc_id, unnest([array_to_string(t[i:i+${n - 1}], ' ')
         |      for i in range(1, len(t) - ${n - 2})]) AS g
         |    FROM toks WHERE len(t) >= $n) GROUP BY doc_id, g) GROUP BY doc_id)""".stripMargin
    }
    def total(n: Int) = s"(len(t) - ${n - 1})"
    val fracs =
      tops.map { case (n, _) =>
        s"""CASE WHEN len(t) >= $n THEN CAST(r$n.maxc AS DOUBLE)
           |  / CAST(${total(n)} AS DOUBLE) ELSE 0.0 END AS top_${n}gram_frac""".stripMargin
      } ++ dups.map { case (n, _) =>
        s"""CASE WHEN len(t) >= $n THEN CAST(${total(n)} - r$n.dist AS DOUBLE)
           |  / CAST(${total(n)} AS DOUBLE) ELSE 0.0 END AS dup_${n}gram_frac""".stripMargin
      }
    val flags =
      tops.map { case (n, thr) => s"top_${n}gram_frac <= $thr AS flag_top_$n" } ++
        dups.map { case (n, thr) => s"dup_${n}gram_frac <= $thr AS flag_dup_$n" }
    val keep =
      (tops.map { case (n, thr) => s"top_${n}gram_frac <= $thr" } ++
        dups.map { case (n, thr) => s"dup_${n}gram_frac <= $thr" })
        .mkString(" AND ")
    val joins = (tops ++ dups).map(_._1)
      .map(n => s"LEFT JOIN r$n USING (doc_id)").mkString(" ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |${ctes.mkString(",\n")},
       |f AS (SELECT doc_id, ${fracs.mkString(",\n  ")}
       |  FROM toks $joins)
       |SELECT doc_id, ${(tops.map(t => s"top_${t._1}gram_frac") ++
        dups.map(d => s"dup_${d._1}gram_frac")).mkString(", ")},
       |  ${flags.mkString(",\n  ")},
       |  $keep AS keep
       |FROM f""".stripMargin
  }

  /** Generated oracle for quality_logit: the same feature formulas as
    * the gopher oracle, the same fixed-order multiply-add chain and the
    * same rational squash, rendered from [[graft.operators.Quality]]'s
    * weight constants so twin and engine cannot drift. Every term is
    * exact IEEE arithmetic (integer counts, single divisions, dyadic
    * weights), hence hash-identical.
    */
  private[graft] def qualityLogitSql: String = {
    import graft.operators.Quality
    val w = Quality.DefaultLogitWeights
    val thr = 0.5
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) > 0
       |      THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS alpha_frac,
       |    CASE WHEN len(toks) > 0
       |      THEN CAST(len(list_filter(toks,
       |        x -> x IN (${Quality.GopherStopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS stop_frac,
       |    CASE WHEN len(toks) > 0
       |      THEN CAST((length(text) - length(replace(text, '#', '')))
       |         + (length(text) - length(replace(text, '...', ''))) // 3
       |         + (length(text) - length(replace(text, '…', ''))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS symbol_ratio,
       |    CAST(length(text) - (len(toks) - 1) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE) AS mean_word_len
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)),
       |g AS (SELECT doc_id, alpha_frac, stop_frac, symbol_ratio, mean_word_len,
       |  ${w.bias} + ${w.alphaFrac} * alpha_frac + ${w.stopFrac} * stop_frac
       |    + ${w.symbolRatio} * symbol_ratio + ${w.meanWordLen} * mean_word_len AS logit
       |  FROM f)
       |SELECT doc_id, alpha_frac, stop_frac, symbol_ratio, mean_word_len, logit,
       |  logit / (1.0 + abs(logit)) AS quality_score,
       |  logit / (1.0 + abs(logit)) >= $thr AS keep
       |FROM g""".stripMargin
  }

  /** Shared CTE prefix of the dsir_weights / dsir_select oracles:
    * unigram+bigram features of the raw (non-src0) and target (src0)
    * corpora, the portable md5 60-bit bucket (mod 1024 — non-negative
    * operand, so `%` matches Spark's `pmod`), and the full-outer
    * smoothed-count model — the DuckDB rendering of
    * [[graft.operators.Dsir.hashedFeatures]] + `bucketModel`. Ends
    * without a trailing comma so callers append either the final SELECT
    * or another CTE.
    */
  private[graft] val dsirWeightsSql: String =
    """WITH rtoks AS (SELECT doc_id, string_split(text, ' ') AS t
      |  FROM documents WHERE source <> 'src0'),
      |ttoks AS (SELECT doc_id, string_split(text, ' ') AS t
      |  FROM documents WHERE source = 'src0'),
      |rg AS (SELECT doc_id, unnest(t) AS gram FROM rtoks
      | UNION ALL
      | SELECT doc_id,
      |  unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS gram
      | FROM rtoks WHERE len(t) >= 2),
      |tg AS (SELECT doc_id, unnest(t) AS gram FROM ttoks
      | UNION ALL
      | SELECT doc_id,
      |  unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS gram
      | FROM ttoks WHERE len(t) >= 2),
      |rf AS (SELECT doc_id,
      |  ('0x' || substr(md5('dsir#' || gram), 1, 15))::BIGINT % 1024 AS bucket,
      |  COUNT(*) AS c
      | FROM rg GROUP BY 1, 2),
      |bt AS (SELECT
      |  ('0x' || substr(md5('dsir#' || gram), 1, 15))::BIGINT % 1024 AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS cnt_t
      | FROM tg GROUP BY 1),
      |br AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS cnt_r
      | FROM rf GROUP BY 1),
      |model AS (SELECT COALESCE(bt.bucket, br.bucket) AS bucket,
      |  COALESCE(cnt_t, 0) AS cnt_t, COALESCE(cnt_r, 0) AS cnt_r
      | FROM bt FULL OUTER JOIN br ON bt.bucket = br.bucket)
      |""".stripMargin

  /** Generated oracle for dedup_keep_best: the dedup_clusters recursive
    * CTE (components over the exact 3-gram Jaccard ≥ 0.5 pair graph)
    * composed with the quality_logit formulas (same constants, same
    * fixed-order chain), survivor = per-component window arg-max on
    * (quality_score DESC, doc_id ASC) — the SQL rendering of
    * min_by(id, (−score, id)).
    */
  /** Generated oracle for doc_pagerank: the exact 3-gram Jaccard pair
    * graph (same CTEs as dedup_clusters), then the fixed-point PageRank
    * recurrence with `iters` iterations UNROLLED as CTE pairs
    * (inflow_k, scores_k). All arithmetic is BIGINT multiply /
    * floor-divide (`//`, matching Spark's `div` on non-negative
    * operands) / SUM-cast-back — order-independent, so the DuckDB hash
    * matches the distributed result bit for bit. The one engine quirk
    * is DuckDB widening SUM(BIGINT) to HUGEINT, cast back immediately.
    */
  /** graph_kcore's oracle: the shared pair-graph CTEs + `peels`
    * synchronous peel rounds unrolled (restrict edges to survivors,
    * recount degrees, keep ≥ k) — the docPagerankSql trick applied to
    * a monotone-shrinking set.
    */
  private[graft] def graphKcoreSql(k: Int = 2, peels: Int = 4): String = {
    val graph =
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |prs AS (SELECT id_a, id_b FROM inter
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) >= 0.5),
        |s0 AS (SELECT doc_id AS id FROM documents)""".stripMargin
    val steps = (1 to peels).map { i =>
      s"""a$i AS (SELECT e.id_a, e.id_b FROM prs e
         |  JOIN s${i - 1} x ON x.id = e.id_a
         |  JOIN s${i - 1} y ON y.id = e.id_b),
         |d$i AS (SELECT nid, COUNT(*) AS d FROM (
         |  SELECT id_a AS nid FROM a$i UNION ALL SELECT id_b FROM a$i)
         |  GROUP BY 1),
         |s$i AS (SELECT nid AS id FROM d$i WHERE d >= $k)""".stripMargin
    }.mkString(",\n", ",\n", "\n")
    graph + steps +
      s"""SELECT d.doc_id, (s.id IS NOT NULL) AS in_kcore
         |FROM documents d LEFT JOIN s$peels s ON s.id = d.doc_id""".stripMargin
  }

  /** doc_pagerank_weighted's oracle: the weighted recurrence with
    * floor(jaccard·10⁶) integer weights, iterations unrolled. score·w
    * stays within BIGINT (10¹² · 10⁶ < 2^63) — the operator's stated
    * overflow contract.
    */
  private[graft] def docPagerankWeightedSql(iters: Int = 3): String = {
    val base = "(15 * (1000000000000 // c.n)) // 100"
    val jac = "CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE)"
    val graph =
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, sh FROM (
         |  SELECT doc_id,
         |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
         |  FROM toks WHERE len(t) >= 3)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |prs AS (SELECT id_a, id_b,
         |    CAST(floor(($jac) * 1000000) AS BIGINT) AS w
         |  FROM inter
         |  JOIN sizes na ON na.doc_id = id_a
         |  JOIN sizes nb ON nb.doc_id = id_b
         |  WHERE $jac >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst, w FROM prs
         |  UNION ALL SELECT id_b, id_a, w FROM prs),
         |wd AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wsum
         |  FROM edges GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, e.w, d.wsum
         |  FROM edges e JOIN wd d USING (src)),
         |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |s0 AS (SELECT doc_id AS id, 1000000000000 // c.n AS score
         |  FROM documents CROSS JOIN c)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""i$k AS (SELECT ed.dst,
         |  CAST(SUM((s.score * ed.w) // ed.wsum) AS BIGINT) AS inflow
         |  FROM ed JOIN s${k - 1} s ON s.id = ed.src GROUP BY 1),
         |s$k AS (SELECT d.doc_id AS id,
         |  $base + COALESCE((85 * i$k.inflow) // 100, 0) AS score
         |  FROM documents d CROSS JOIN c
         |  LEFT JOIN i$k ON i$k.dst = d.doc_id)""".stripMargin
    }.mkString(",\n", ",\n", "\n")
    graph + steps + s"SELECT id AS doc_id, score FROM s$iters"
  }

  /** Unrolled-CTE oracle for graph_communities: the same exact 3-gram
    * Jaccard pair graph as docPagerankSql, then `iters` synchronous
    * label-propagation rounds — per round a (node, label) frequency
    * count over the symmetrized edges, a QUALIFY argmax with the
    * (count DESC, label ASC) tie-break, and a left join back to the
    * node set (isolated nodes keep their own id).
    */
  /** The Hilbert xy2d walk as 16 unrolled CTE levels (the trick that
    * keeps an inherently-sequential bit algorithm linear in SQL: each
    * level MATERIALIZES rows, where a nested expression unrolling would
    * double per level). Input CTE `h_init(ox, oy, wx, wy, hd)`; output
    * CTE `h0` with the final index in `hd` and the original normalized
    * point in (ox, oy). Verified token-for-token against
    * [[graft.functions.Kernels.hilbert]].
    */
  private[graft] def hilbertStepsSql: String =
    (15 to 0 by -1).map { b =>
      val s = 1L << b
      s"""h$b AS (
         |  SELECT ox, oy,
         |    CAST(CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $s - 1 - wy ELSE wy END) ELSE wx END AS BIGINT) AS wx,
         |    CAST(CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $s - 1 - wx ELSE wx END) ELSE wy END AS BIGINT) AS wy,
         |    CAST(hd + ${s * s} * xor(3 * rx, ry) AS BIGINT) AS hd
         |  FROM (SELECT ox, oy, wx, wy, hd,
         |      CAST(CASE WHEN (wx & $s) > 0 THEN 1 ELSE 0 END AS BIGINT) AS rx,
         |      CAST(CASE WHEN (wy & $s) > 0 THEN 1 ELSE 0 END AS BIGINT) AS ry
         |    FROM ${if (b == 15) "h_init" else s"h${b + 1}"}))""".stripMargin
    }.mkString(",\n")

  /** Shared head for the zorder3_* oracles: normalized 3-D lineitem
    * points + the triple Morton spread chain; ends at CTE `zv3` with
    * the 48-bit value in `zv` and the normalized point in (x, y, z).
    */
  private[graft] def zorder3GraphSql: String = {
    val masks = Seq((32, 0x1f00000000ffffL), (16, 0x1f0000ff0000ffL),
      (8, 0x100f00f00f00f00fL), (4, 0x10c30c30c30c30c3L),
      (2, 0x1249249249249249L))
    val steps = masks.zipWithIndex.map { case ((sh, mask), i) =>
      s"""p${i + 1} AS (SELECT x, y, z,
         |  (xa | (xa << $sh)) & $mask AS xa,
         |  (ya | (ya << $sh)) & $mask AS ya,
         |  (za | (za << $sh)) & $mask AS za FROM p$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH st AS (SELECT CAST(max(l_partkey) AS BIGINT) AS px,
       |  CAST(max(l_suppkey) AS BIGINT) AS sx,
       |  CAST(max(l_quantity) AS BIGINT) AS qx FROM lineitem),
       |pts AS (SELECT
       |  (least(greatest(l_partkey, 0), px) * 65535) // px AS x,
       |  (least(greatest(l_suppkey, 0), sx) * 65535) // sx AS y,
       |  (least(greatest(CAST(l_quantity AS BIGINT), 0), qx) * 65535) // qx AS z
       |  FROM lineitem, st),
       |p0 AS (SELECT x, y, z, x AS xa, y AS ya, z AS za FROM pts),
       |$steps,
       |zv3 AS (SELECT x, y, z, (xa | (ya << 1) | (za << 2)) AS zv FROM p5)""".stripMargin
  }

  /** Shared head for the hilbert_* oracles: normalized lineitem points
    * + the walk; ends at CTE `h0`.
    */
  private[graft] def hilbertGraphSql: String =
    s"""WITH st AS (SELECT CAST(max(l_partkey) AS BIGINT) AS px,
       |                   CAST(max(l_suppkey) AS BIGINT) AS sx
       |            FROM lineitem),
       |pts AS (SELECT
       |  (least(greatest(l_partkey, 0), px) * 65535) // px AS x,
       |  (least(greatest(l_suppkey, 0), sx) * 65535) // sx AS y
       |  FROM lineitem, st),
       |h_init AS (SELECT x AS ox, y AS oy, x AS wx, y AS wy,
       |  CAST(0 AS BIGINT) AS hd FROM pts),
       |$hilbertStepsSql""".stripMargin

  private[graft] def docLabelPropSql(iters: Int = 3): String = {
    val graph =
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |prs AS (SELECT id_a, id_b FROM inter
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) >= 0.5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
        |  UNION ALL SELECT id_b, id_a FROM prs),
        |l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""p$k AS (SELECT dst, label FROM (
         |  SELECT e.dst, l.label, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM edges e JOIN l${k - 1} l ON l.id = e.src GROUP BY 1, 2)
         |  QUALIFY row_number() OVER (PARTITION BY dst
         |    ORDER BY c DESC, label ASC) = 1),
         |l$k AS (SELECT d.doc_id AS id, COALESCE(p$k.label, d.doc_id) AS label
         |  FROM documents d LEFT JOIN p$k ON p$k.dst = d.doc_id)""".stripMargin
    }.mkString(",\n", ",\n", "\n")
    graph + steps + s"SELECT id AS doc_id, label AS community FROM l$iters"
  }

  /** The exact-3-gram shingle CTE shared by the Jaccard pair-graph
    * family, optionally df-CAPPED: with a cap, shingles held by more
    * than `cap` docs leave the universe entirely — intersections AND
    * set sizes — mirroring `Dedup.ngramJaccardPairs(maxDocFreq)`
    * exactly (the dedup_containment_capped recipe), so the capped
    * Spark queries stay hash-green against these CTEs.
    */
  private def shingleCte(cap: Option[Int]): String = cap match {
    case None =>
      """sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id,
        |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3))""".stripMargin
    case Some(c) =>
      s"""sh0 AS (SELECT DISTINCT doc_id, sh FROM (
         |  SELECT doc_id,
         |   unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
         |  FROM toks WHERE len(t) >= 3)),
         |hot AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) > $c),
         |sh AS (SELECT doc_id, sh FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot))""".stripMargin
  }

  /** toks → sh → sizes → inter → `pairsName` CTE chain for the exact
    * 3-gram Jaccard ≥ 0.5 pair graph (no WITH keyword — callers prefix
    * WITH / WITH RECURSIVE as needed).
    */
  private def jaccardPairGraph(pairsName: String,
                               cap: Option[Int]): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |${shingleCte(cap)},
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |$pairsName AS (SELECT id_a, id_b FROM inter
       |  JOIN sizes na ON na.doc_id = id_a
       |  JOIN sizes nb ON nb.doc_id = id_b
       |  WHERE CAST(i AS DOUBLE) / CAST(na.n_sh + nb.n_sh - i AS DOUBLE) >= 0.5)""".stripMargin

  /** dedup_clusters' oracle, optionally df-capped — the capped variant
    * is the production transitive-cluster twin (`dedup_clusters_capped`).
    */
  private[graft] def dedupClustersSql(cap: Option[Int] = None): String =
    s"""WITH RECURSIVE
       |${jaccardPairGraph("pairs", cap)},
       |edges AS (SELECT id_a AS s, id_b AS t FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, comp) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.t, r.comp FROM reach r JOIN edges e ON e.s = r.id)
       |SELECT d.doc_id, COALESCE(MIN(r.comp), d.doc_id) AS component
       |FROM documents d LEFT JOIN reach r ON r.id = d.doc_id
       |GROUP BY d.doc_id""".stripMargin

  private[graft] def docPagerankSql(iters: Int = 3,
                                    cap: Option[Int] = None): String = {
    val base = "(15 * (1000000000000 // c.n)) // 100"
    val graph =
      s"""WITH ${jaccardPairGraph("prs", cap)},
        |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
        |  UNION ALL SELECT id_b, id_a FROM prs),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM edges GROUP BY 1),
        |ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |s0 AS (SELECT doc_id AS id, 1000000000000 // c.n AS score
        |  FROM documents CROSS JOIN c)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""i$k AS (SELECT ed.dst, CAST(SUM(s.score // ed.deg) AS BIGINT) AS inflow
         |  FROM ed JOIN s${k - 1} s ON s.id = ed.src GROUP BY 1),
         |s$k AS (SELECT d.doc_id AS id,
         |  $base + COALESCE((85 * i$k.inflow) // 100, 0) AS score
         |  FROM documents d CROSS JOIN c
         |  LEFT JOIN i$k ON i$k.dst = d.doc_id)""".stripMargin
    }.mkString(",\n", ",\n", "\n")
    graph + steps + s"SELECT id AS doc_id, score FROM s$iters"
  }

  private[graft] def dedupKeepBestSql(cap: Option[Int] = None): String = {
    import graft.operators.Quality
    val w = Quality.DefaultLogitWeights
    s"""WITH RECURSIVE
       |${jaccardPairGraph("prs", cap)},
       |edges AS (SELECT id_a AS s, id_b AS t FROM prs
       |  UNION SELECT id_b, id_a FROM prs),
       |reach(id, comp) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.t, r.comp FROM reach r JOIN edges e ON e.s = r.id),
       |comp AS (SELECT d.doc_id, COALESCE(MIN(r.comp), d.doc_id) AS component
       |  FROM documents d LEFT JOIN reach r ON r.id = d.doc_id
       |  GROUP BY d.doc_id),
       |f AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) > 0
       |      THEN CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
       |        / CAST(len(t) AS DOUBLE) ELSE 0.0 END AS alpha_frac,
       |    CASE WHEN len(t) > 0
       |      THEN CAST(len(list_filter(t,
       |        x -> x IN (${Quality.GopherStopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE)
       |        / CAST(len(t) AS DOUBLE) ELSE 0.0 END AS stop_frac,
       |    CASE WHEN len(t) > 0
       |      THEN CAST((length(text) - length(replace(text, '#', '')))
       |         + (length(text) - length(replace(text, '...', ''))) // 3
       |         + (length(text) - length(replace(text, '…', ''))) AS DOUBLE)
       |        / CAST(len(t) AS DOUBLE) ELSE 0.0 END AS symbol_ratio,
       |    CAST(length(text) - (len(t) - 1) AS DOUBLE)
       |      / CAST(len(t) AS DOUBLE) AS mean_word_len
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)),
       |q AS (SELECT doc_id, logit / (1.0 + abs(logit)) AS quality_score
       |  FROM (SELECT doc_id,
       |    ${w.bias} + ${w.alphaFrac} * alpha_frac + ${w.stopFrac} * stop_frac
       |      + ${w.symbolRatio} * symbol_ratio + ${w.meanWordLen} * mean_word_len AS logit
       |    FROM f)),
       |ranked AS (SELECT c.doc_id, c.component, q.quality_score,
       |    ROW_NUMBER() OVER (PARTITION BY c.component
       |      ORDER BY q.quality_score DESC, c.doc_id) AS rn
       |  FROM comp c JOIN q ON q.doc_id = c.doc_id)
       |SELECT d.doc_id, d.source, r.quality_score
       |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
       |WHERE r.rn = 1""".stripMargin
  }

  /** Generated oracle for corpus_report: the gopher-rule and logit-gate
    * formulas (same constants as their standalone oracles) rolled up
    * per source — COUNT/COUNT DISTINCT/SUM over exact integers.
    */
  private[graft] def corpusReportSql: String = {
    import graft.operators.Quality
    val w = Quality.DefaultLogitWeights
    s"""WITH f AS (
       |  SELECT source, text,
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
       |      x -> x IN (${Quality.GopherStopwords.map("'" + _ + "'").mkString(",")}))) AS n_stop
       |  FROM (SELECT source, text, string_split(text, ' ') AS toks FROM documents)),
       |g AS (SELECT source, text, n_words,
       |    (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
       |      AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND n_stop >= 2 AS gk,
       |    ${w.bias} + ${w.alphaFrac} * (CASE WHEN n_words > 0 THEN alpha_frac ELSE 0.0 END)
       |      + ${w.stopFrac} * (CASE WHEN n_words > 0
       |          THEN CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END)
       |      + ${w.symbolRatio} * (CASE WHEN n_words > 0 THEN symbol_ratio ELSE 0.0 END)
       |      + ${w.meanWordLen} * mean_word_len AS logit
       |  FROM f)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  COUNT(DISTINCT text) AS n_distinct_texts,
       |  COUNT(*) - COUNT(DISTINCT text) AS n_dup_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN gk THEN 1 ELSE 0 END) AS BIGINT) AS gopher_keep,
       |  CAST(SUM(CASE WHEN logit / (1.0 + abs(logit)) >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS logit_keep
       |FROM g GROUP BY source""".stripMargin
  }
}
