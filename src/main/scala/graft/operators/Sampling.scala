package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting/sampling for training pipelines.
  *
  * The split assignment must be a PURE FUNCTION of the row's identity —
  * not of partitioning, row order, cluster size, or a sampler's RNG
  * stream — so that (a) re-running the pipeline (or re-running it on
  * 1000 executors instead of 32 cores) yields the identical split, and
  * (b) a row's membership never silently flips when upstream data is
  * appended. `randomSplit` guarantees neither. Hash-bucketing on a
  * cryptographic digest of the id gives both, and is portable: md5 hex
  * is identical in every engine, so the assignment is even
  * oracle-checkable bit-for-bit against DuckDB.
  */
object Sampling {

  /** Lowercase hex md5 bucket key of (salt ++ id), first 4 hex chars =
    * 65,536 buckets. Lexicographic comparison of the hex prefix IS the
    * bucket comparison (both engines emit lowercase hex), which keeps
    * the predicate a plain string compare — no hex→int conversion that
    * engines disagree on.
    */
  def bucketKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 4)

  /** Threshold hex prefix for a fraction: rows with bucketKey < this are
    * inside the fraction. Granularity 1/65536 (documented; exact split
    * sizes converge at corpus scale).
    */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction must be in [0,1], got $frac")
    val b = math.round(frac * 65536.0).toInt
    // frac=1 must admit every key; the 5-char "10000" would sort BEFORE
    // most 4-char keys ('1' < '2'..'f'), so use a sentinel above hex
    if (b >= 65536) "g" else f"$b%04x"
  }

  /** Deterministic train/holdout split column: 'train' for ~`trainFrac`
    * of rows, 'holdout' for the rest, stable under re-runs, appends,
    * repartitioning and engine changes. Change `salt` to draw an
    * independent split.
    */
  def hashSplit(df: DataFrame, id: Column, trainFrac: Double,
                salt: String = "graft"): DataFrame =
    df.withColumn("split",
      when(bucketKey(id, salt) < lit(thresholdHex(trainFrac)), lit("train"))
        .otherwise(lit("holdout")))

  /** Train/holdout leakage audit: exact-content keys that appear on BOTH
    * sides of a [[hashSplit]] — the eval-contamination check every split
    * needs before the holdout is trusted (identical documents landing in
    * both splits silently inflate eval scores). One row per leaked key:
    * per-split counts plus the min doc id on each side as the repro
    * handle.
    *
    * Scale shape: ONE hash aggregation on the content key with map-side
    * partial pivots — never a train×holdout self-join (equal-content
    * groups are tiny, but a join would shuffle both sides keyed by full
    * text; here only the aggregated groups cross the exchange, and
    * unique texts — the overwhelming majority — collapse to one row
    * before the filter drops them). Pass a digest column as `content`
    * for wide documents so 8 bytes per row cross the wire, not the text
    * (the [[graft.operators.Snapshot]] convention).
    */
  def splitLeakage(df: DataFrame, id: Column, content: Column,
                   trainFrac: Double, salt: String = "graft"): DataFrame = {
    val sp = hashSplit(df, id, trainFrac, salt)
    sp.groupBy(content.as("leak_key"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "holdout", 1L).otherwise(0L)).as("n_holdout"),
        min(when(col("split") === "train", id)).as("train_id"),
        min(when(col("split") === "holdout", id)).as("holdout_id"))
      .filter(col("n_train") > 0 && col("n_holdout") > 0)
  }

  /** Leakage-FREE split: assign by a GROUP key instead of the row id,
    * so every member of a group lands in the same split by
    * construction — the fix for what [[splitLeakage]] audits
    * (duplicate documents straddling train/holdout silently inflate
    * eval scores; splitting by content key makes that impossible for
    * exact copies, and splitting by a near-dup CLUSTER representative
    * — `Dedup` cluster ids work directly as `group` — extends the
    * guarantee to near-duplicates). Same md5 bucketing as
    * [[hashSplit]], same stability contract; the observed train
    * fraction now converges over GROUPS, not rows, so heavy groups
    * wobble it — that is the price of the guarantee, not a bug.
    *
    * Scale shape: a pure zero-shuffle projection, exactly like
    * [[hashSplit]] — the group key is hashed per row, never joined.
    */
  def groupSafeSplit(df: DataFrame, group: Column, trainFrac: Double,
                     salt: String = "graft"): DataFrame =
    df.withColumn("split",
      when(bucketKey(group, salt) < lit(thresholdHex(trainFrac)),
        lit("train")).otherwise(lit("holdout")))

  /** Deterministic fixed-k sample PER GROUP — the balanced-eval-set
    * draw ([[stratifiedSample]] keeps a FRACTION per stratum, so rare
    * strata keep almost nothing; capping every group at exactly k
    * rows is what an eval set balanced across languages/sources
    * needs). Rows are ranked inside each group by the md5 of the row
    * id (salted) and the top k kept — stable under re-runs, appends
    * only perturb a group's sample where new ids hash below its
    * current k-th key.
    *
    * Scale shape: one exchange keyed on the group + a per-group
    * window rank. Group sizes bound the window buffer; for
    * billion-row groups cap first by a cheap hash-range pre-filter
    * (keep ~4k/|group| by [[bucketKey]] range, then rank the
    * survivors — same result, window input bounded).
    */
  def fixedPerGroupSample(df: DataFrame, id: Column, group: Column,
                          k: Int, salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__sk").asc, col("__id_s").asc)
    df.withColumn("__g", group)
      .withColumn("__sk", bucketKey(id, salt))
      .withColumn("__id_s", id.cast("string"))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
      .drop("__g", "__sk", "__id_s")
  }

  /** Per-stratum deterministic sample: keeps ~`fractions(stratum)` of each
    * stratum's rows (absent strata keep nothing), selected by the same
    * id-hash bucketing as [[hashSplit]] — so the sample is a stable subset
    * (a row either is or is not in the sample, forever), unlike
    * `df.stat.sampleBy`'s RNG-stream draw which reshuffles membership
    * whenever partitioning changes.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       fractions: Map[String, Double],
                       salt: String = "graft"): DataFrame = {
    val key = bucketKey(id, salt)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (s, f)) =>
      acc || (stratum === lit(s) && key < lit(thresholdHex(f)))
    }
    df.filter(keep)
  }

  /** Temperature-tempered mixture weights per group — the training-mix
    * primitive (sample source s proportionally to n_s^alpha; alpha<1
    * upweights small sources, cf. the multilingual-pretraining mixes of
    * XLM-R/mT5). Output: group column + `n_units` (exact long sum of
    * `size`) + `weight` in (0,1] summing to 1.
    *
    * Engine-portable exactness at the default alpha=0.5: IEEE requires
    * sqrt to be correctly rounded (unlike pow), so sqrt(n) is
    * bit-identical everywhere; floor(sqrt(n)*1e6 + 0.5) micro-units
    * make the tempered masses integral, hence their sum is exact and
    * order-independent, and each weight is one shared IEEE division —
    * the same quantization trick as the centroid aggregate. A non-0.5
    * alpha goes through pow, which libms round differently at ulp
    * level: correct to ~1e-15, but rows-only checkable.
    *
    * Scale: one partial-agg shuffle on the group key (group cardinality
    * rows out); the normalizing total is a whole-frame window over that
    * already-tiny counts table — single lineage, so the corpus is
    * scanned exactly once (an agg-then-join would duplicate the scan).
    * The unpartitioned window's one-partition stage holds group-
    * cardinality rows, not corpus rows.
    */
  /** Fixed-SIZE deterministic sample per stratum: the n rows with the
    * smallest md5(salt ++ id) in each stratum — eval-set construction
    * by COUNT ("500 eval docs per language") where [[stratifiedSample]]
    * samples by fraction. Same identity-hash guarantees: membership is
    * a pure function of (id, salt, the stratum's other members), stable
    * under re-runs, partitioning and engines — and the md5 hex order is
    * portable, so the selection is DuckDB-oracle-checkable. Note the
    * one semantic difference from fraction sampling: adding corpus rows
    * can displace a previously-sampled row from the top-n (fixed size
    * forces that for ANY scheme).
    *
    * Scale: one exchange on the stratum; Spark plans the rank filter as
    * a WindowGroupLimit (map-side partial top-n per stratum), so at
    * most n rows per stratum per input partition reach the shuffle —
    * not the whole corpus.
    */
  def fixedSizeSample(df: DataFrame, id: Column, stratum: Column, n: Int,
                      salt: String = "graft"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(salt), id.cast("string")))
    val w = Window.partitionBy(stratum).orderBy(key.asc, id.asc)
    df.withColumn("__fs_rank", row_number().over(w))
      .filter(col("__fs_rank") <= n)
      .drop("__fs_rank")
  }

  /** Weighted (probability-proportional-to-size) systematic sample of
    * ~`k` rows per stratum — the "sample documents ∝ token count /
    * quality weight" primitive, done the survey-statistics way instead
    * of with per-row RNG keys: lay the stratum's rows along a weighted
    * axis in md5-shuffled order, place `k` equally-spaced cuts with a
    * random start u0 uniform in (0, total/k] — derived from
    * md5(salt # stratum), NOT a fixed start, because a deterministic
    * cut position skews inclusion toward whichever rows the ordering
    * puts at it — and keep every row whose interval contains a cut.
    * Textbook systematic PPS: inclusion probability is EXACTLY
    * min(1, k·w/total) regardless of ordering. The whole construction
    * is EXACT INTEGER arithmetic on the k-scaled axis:
    * cuts-below-x is `(k·x − u0 + total) div total` over exact longs,
    * u0 = 1 + (md5-60-bit mod total) — no pow/log/float-ordering
    * anywhere, so the selected set is bit-portable across engines and
    * DuckDB-oracle-checkable (the Efraimidis–Spirakis u^(1/w) key
    * form is equivalent in distribution but orders by a
    * transcendental, which is exactly the tfidf LogIdf ulp trap). The
    * md5 row ordering decorrelates neighbors; changing `salt` draws an
    * independent sample. (k·total must fit in a long — swap the cut
    * test to DECIMAL(38) arithmetic past ~10^18/k units of stratum
    * mass.)
    *
    * Selects exactly `k` rows per stratum when every weight <
    * total/k; a row heavier than the sampling interval straddles
    * multiple cuts and is kept ONCE (so such strata yield fewer than
    * `k` rows — the standard certainty-unit contraction).
    *
    * Scale: per-stratum totals are a map-side-combined aggregate
    * broadcast back (NOT a full-frame window, which would buffer each
    * stratum in the window buffer); the running sum is a streaming
    * running-frame window per stratum. One exchange on the stratum.
    * Strata are the parallelism unit — for a single giant stratum,
    * swap the window for the two-level partition prefix sum used by
    * [[Packing]] (per-partition subtotals + broadcast offsets); the
    * cut test is unchanged.
    *
    * Output: input columns + `weight` (the long-cast weight).
    */
  def weightedSystematicSample(df: DataFrame, id: Column, stratum: Column,
                               weight: Column, k: Int,
                               salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(salt), id.cast("string")))
    val run = Window.partitionBy(col("__ws_g")).orderBy(key.asc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sized = df.withColumn("__ws_g", stratum)
      .withColumn("weight", weight.cast("long"))
    val totals = sized.groupBy(col("__ws_g"))
      .agg(sum(col("weight")).as("__ws_tot"))
    // random start on the k-scaled axis: 60 bits of md5(salt # stratum)
    // (15 hex chars -> exact long in both engines: conv() here,
    // ('0x'||hex)::BIGINT in DuckDB), reduced mod total — the mod bias
    // is ~total/2^60, immaterial
    val u0 = pmod(
      conv(substring(md5(concat(lit(salt + "#"),
        col("__ws_g").cast("string"))), 1, 15), 16, 10).cast("long"),
      col("__ws_tot")) + lit(1L)
    sized.join(broadcast(totals), "__ws_g")
      .withColumn("__ws_cum", sum(col("weight")).over(run))
      .withColumn("__ws_u0", u0)
      // cuts-below-x count; integer div on exact longs — both engines
      // floor identically for the non-negative operands guaranteed by
      // weights >= 0 and u0 <= total
      .filter(expr(s"($k * __ws_cum - __ws_u0 + __ws_tot) div __ws_tot") >
        expr(s"($k * (__ws_cum - weight) - __ws_u0 + __ws_tot) div __ws_tot"))
      .drop("__ws_g", "__ws_tot", "__ws_cum", "__ws_u0")
  }

  /** Quantile bucketing of a numeric column — the length-curriculum /
    * batch-shape primitive: cut the corpus at the given quantiles of
    * `value` and label every row with its bucket (1-based; rows above
    * the last cut get `fracs.size + 1`). Cut semantics: bucket b is the
    * first whose cut point is >= value (exact interpolated percentile,
    * the `quantile_cont` definition, so the assignment is
    * oracle-checkable bit-for-bit).
    *
    * Scale shape: one aggregate computes ALL cut points (a single
    * array-percentile pass), the resulting 1-row frame broadcasts, and
    * the bucket label is a codegen'd when-chain per row — no shuffle of
    * the data itself, no window. Exact `percentile` buffers the column
    * per-partition at aggregation time; at 100-TB swap in
    * approx_percentile cut points (the q_percentiles_approx trade) —
    * bucket EDGES move within sketch tolerance but the operator shape
    * is unchanged. Two source scans by necessity — global cut points
    * require a full pass before any row can be labeled — and the
    * second pass re-reads the (column-pruned) source instead of
    * caching the corpus: at 100 TB, re-scanning one pruned column
    * beats materializing it.
    *
    * Output: input columns + `<outCol>` (integer bucket).
    */
  def quantileBuckets(df: DataFrame, value: Column,
                      fracs: Seq[Double] = Seq(0.25, 0.5, 0.75),
                      outCol: String = "bucket"): DataFrame = {
    require(fracs.nonEmpty, "fracs must be non-empty")
    require(fracs.forall(f => f > 0.0 && f < 1.0),
      s"fracs must be inside (0,1), got $fracs")
    require(fracs == fracs.sorted && fracs.distinct == fracs,
      s"fracs must be strictly increasing, got $fracs")
    val sized = df.withColumn("__qb_v", value.cast("double"))
    val cuts = sized.agg(
      expr(s"percentile(__qb_v, array(${fracs.mkString(",")}))").as("__qb_cuts"))
    // when-chain, smallest cut first — plain Column comparisons keep the
    // assignment inside whole-stage codegen (an aggregate() HOF over the
    // cuts array would run interpreted per row)
    val bucket = fracs.indices.reverse.foldLeft(lit(fracs.size + 1)) {
      (acc, i) =>
        when(col("__qb_v") <= element_at(col("__qb_cuts"), i + 1), lit(i + 1))
          .otherwise(acc)
    }
    sized.crossJoin(broadcast(cuts))
      .withColumn(outCol, bucket)
      .drop("__qb_v", "__qb_cuts")
  }

  /** Training-mix temperature sampling: per-group unit masses tempered by
    * `alpha` (n^alpha), emitted as `(group, n_units, q_units, weight)`.
    * `q_units` is the tempered mass quantized to micro-units —
    * `floor(n^alpha * 1e6 + 0.5)` as an exact long — so downstream exact
    * comparisons (and the DuckDB oracle) can consume an integral column;
    * `weight` is the normalized share, one shared IEEE division per row
    * over the exact long sum. Oracle-checked consumers should project
    * `q_units`, not `weight`: a raw double cell is hash-fragile across
    * engines even when bit-identical (round-7 driver finding).
    */
  def temperatureWeights(df: DataFrame, group: Column, size: Column,
                         alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(group)
      .agg(sum(size.cast("long")).as("n_units"))
    val tempered =
      if (alpha == 0.5) sqrt(col("n_units").cast("double"))
      else pow(col("n_units").cast("double"), lit(alpha))
    counts
      .withColumn("q_units",
        floor(tempered * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("weight",
        col("q_units") / sum(col("q_units")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
  }

  /** Epoch-capped token-budget allocation — water-filling over the
    * tempered mixture: split `totalTokens` across groups proportionally
    * to [[temperatureWeights]]' tempered masses, but cap every group at
    * `maxEpochs` passes over its own `n_units` (the data-mixing
    * computation of LLM training recipes: a small high-weight source
    * must not be repeated tens of epochs just because the temperature
    * upweights it).
    *
    * Solved in CLOSED FORM, no iteration: allocation is
    * `min(cap_i, λ·q_i)` where λ is the water level making the total hit
    * the budget. Sort groups by `cap_i/q_i` ascending; for k capped
    * groups the candidate level is `λ_k = (T - Σcap_{≤k}) / Σq_{>k}`,
    * and the unique valid k satisfies `r_k <= λ_k <= r_{k+1}` — one
    * window pass over the GROUP-CARDINALITY table (sources, not
    * documents — the single-partition window is deliberate and tiny),
    * then the scalar λ broadcasts back. If the budget exceeds every
    * cap (infeasible), allocation degrades to the caps and the total is
    * `Σcap < T` — no iteration, no failure.
    *
    * Engine-portable by the [[temperatureWeights]] argument: every
    * input to λ is an exact long, λ itself is one IEEE division, and
    * each group's allocation is `min(cap, floor(λ·q))` — identical
    * doubles, identical floors in any IEEE engine, integral output.
    * Σalloc can undershoot T by at most one token per group (the
    * floors) plus any infeasibility gap. Output: (group, n_units,
    * q_units, cap_tokens, alloc_tokens).
    *
    * CONTRACT — small group cardinality: the water-level sort runs in a
    * single-partition global window, which is deliberate and cheap
    * BECAUSE it orders the per-GROUP aggregate (one row per training
    * source — tens to thousands of rows), never per-document rows.
    * Passing a high-cardinality column (doc_id, url, ...) as `group`
    * would funnel the whole corpus through one task; the in-plan
    * `maxGroups` guard (default 1M) fails that loudly at execution
    * instead of letting it crawl.
    */
  def allocateBudget(df: DataFrame, group: Column, size: Column,
                     totalTokens: Long, maxEpochs: Double,
                     alpha: Double = 0.5, maxGroups: Int = 1000000): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(maxEpochs > 0.0, s"maxEpochs must be positive, got $maxEpochs")
    require(maxGroups > 0, s"maxGroups must be positive, got $maxGroups")
    import org.apache.spark.sql.expressions.Window
    val tw = temperatureWeights(df, group, size, alpha).drop("weight")
    val gname = tw.columns.head
    val caps = tw.withColumn("cap_tokens",
        floor(col("n_units").cast("double") * lit(maxEpochs)).cast("long"))
      .withColumn("__r",
        col("cap_tokens").cast("double") / col("q_units").cast("double"))
    // zero-mass groups (q_units = 0, possible only when the group's
    // size sum is 0 or NULL) are excluded from the water-level math —
    // 0/0 would make __r NULL, sort first, and poison the next row's
    // lag(__r) so the valid candidate's predicate goes NULL and the
    // whole allocation silently degrades to caps. They get 0 tokens in
    // the output (their cap is 0 anyway).
    val live = caps.filter(col("q_units") > 0)
    val ord = Window.orderBy(col("__r"), col(gname))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // two projections: lag of a windowed sum can't nest in one select
    // the guard rides __totQ (a column the λ math actually consumes —
    // a standalone guard column would be pruned away unevaluated); the
    // count shares the global window, so it costs nothing extra
    val nGroups = count(lit(1)).over(Window.partitionBy())
    val sums = live
      .withColumn("__cumC", sum(col("cap_tokens")).over(cum))
      .withColumn("__cumQ", sum(col("q_units")).over(cum))
      .withColumn("__totQ",
        when(nGroups > lit(maxGroups.toLong),
          raise_error(concat(
            lit("allocateBudget: group cardinality "),
            nGroups.cast("string"),
            lit(s" exceeds maxGroups=$maxGroups — the water-level window " +
              "is single-partition over the per-GROUP table by design; " +
              "was a per-document column passed as `group`?"))).cast("long"))
          .otherwise(sum(col("q_units")).over(Window.partitionBy())))
    val cands = sums
      .withColumn("__cPrev", lag(col("__cumC"), 1, 0L).over(ord))
      .withColumn("__qPrev", lag(col("__cumQ"), 1, 0L).over(ord))
      .withColumn("__rPrev", lag(col("__r"), 1, 0.0).over(ord))
      .withColumn("__lam",
        (lit(totalTokens.toDouble) - col("__cPrev").cast("double")) /
          (col("__totQ") - col("__qPrev")).cast("double"))
    // the unique valid water level (NULL when the budget exceeds all
    // caps — the infeasible case, which degrades to the caps below)
    val lambda = cands
      .agg(min(when(col("__lam") >= col("__rPrev") &&
        col("__lam") <= col("__r"), col("__lam"))).as("__lambda"))
    caps.crossJoin(broadcast(lambda))
      .select(col(gname), col("n_units"), col("q_units"), col("cap_tokens"),
        when(col("q_units") > 0,
          least(col("cap_tokens"),
            coalesce(floor(col("__lambda") * col("q_units").cast("double"))
              .cast("long"), col("cap_tokens"))))
          .otherwise(lit(0L)).as("alloc_tokens"))
  }
}
