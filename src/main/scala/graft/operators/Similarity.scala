package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k. The query side is
  *     broadcast (it is the small side by construction), so the corpus
  *     is scanned exactly once with no shuffle of the corpus — this is
  *     the right baseline even at large corpus scale as long as the
  *     query set fits in a broadcast.
  *   - [[srpBucketTopK]]: the scale path — signed-random-projection
  *     bucketing on both sides turns candidate generation into an
  *     equi-join on the bucket code; only candidates are reranked
  *     exactly. Recall is tunable via `bits` (fewer bits → bigger
  *     buckets → higher recall, more rerank work).
  */
object Similarity {

  /** Exact top-`k` cosine neighbors for each query row.
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k,
    * deterministic tie-break on neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val scored = joined.select(col("query_id"), col("neighbor_id"),
      VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    Similarity.rankTopK(scored, k)
  }

  /** Shared top-k ranking via the bounded heap aggregate
    * ([[graft.functions.TopKAgg]]): at most k candidates per query cross
    * the shuffle (map-side partial top-k), where the window+row_number
    * form shuffles and sorts EVERY candidate. Ordering contract matches
    * the window form exactly: cosine DESC, neighbor_id ASC on ties.
    */
  private[graft] def rankTopK(scored: org.apache.spark.sql.DataFrame,
                              k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    // Widen only LOSSLESSLY (integral id -> bigint, fractional score ->
    // double); anything else reaches TopKAgg untouched and is rejected at
    // analysis. A blanket cast would silently truncate fractional ids or
    // null-out strings instead of failing.
    val idType = scored.schema("neighbor_id").dataType
    val idCol = idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col("neighbor_id").cast("bigint")
      case _ => col("neighbor_id")
    }
    val scoreCol = scored.schema("cosine").dataType match {
      case FloatType | DoubleType => col("cosine").cast("double")
      case _                      => col("cosine")
    }
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(scoreCol, idCol, k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** ANN top-`k` via SRP bucket candidate generation + exact rerank.
    * `probes > 0` additionally probes buckets at Hamming distance 1 from
    * the query code (multi-probe), trading compute for recall.
    */
  def srpBucketTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                    queries: DataFrame, queryId: Column, queryVec: Column,
                    k: Int, dim: Int, bits: Int = 12,
                    probes: Int = 1, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"),
      VectorFunctions.srpCode(corpusVec, dim, bits).as("bucket"))
    val qCode = VectorFunctions.srpCode(queryVec, dim, bits)
    // query probes: own bucket plus the first `probes` single-bit flips
    // (multi-probe LSH) — probes bounds the extra buckets scanned, the
    // documented compute/recall trade-off.
    val probeCodes =
      if (probes <= 0) array(qCode)
      else array((qCode +: (0 until bits).take(probes).map(b =>
        qCode.bitwiseXOR(lit(1L << b)))): _*)
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
      explode(array_distinct(probeCodes)).as("bucket"))
    // Each corpus row has exactly ONE bucket code and the probe codes are
    // distinct, so a (query, neighbor) pair joins at most once — no
    // dedup (and no extra shuffle) needed before scoring.
    val candsAll = c.join(broadcast(q), Seq("bucket"))
    // excludeSelf assumes query and corpus ids share one id space; set it
    // false when they don't (a colliding external query id would silently
    // drop an unrelated true neighbor otherwise)
    val cands = if (excludeSelf)
      candsAll.filter(col("query_id") =!= col("neighbor_id")) else candsAll
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      VectorFunctions.cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Duplicate-pair join over INTEGER vectors with the cosine threshold
    * decided in EXACT integer arithmetic: `cos(a,b) ≥ tNum/tDen` ⟺
    * `dot > 0 ∧ dot²·tDen² ≥ tNum²·‖a‖²·‖b‖²` — dot products and
    * squared norms of long vectors are exact longs, and the one
    * comparison that can exceed 64 bits runs in decimal(38,0), so the
    * decision is bit-identical on ANY engine (a SQL oracle recomputes
    * it verbatim; no IEEE rounding anywhere). This is what makes an
    * image/content near-dup operator hash-checkable end to end, where
    * a float cosine threshold is only gate-checkable. A degenerate
    * all-zero vector (‖a‖ = 0) is never a duplicate of anything —
    * `dot > 0` settles that without a division.
    *
    * Candidates: `bits = 0` scores ALL pairs (the verified oracle-
    * anchor form — caller caps the input); `bits > 0` generates
    * candidates with the same banded SRP-OR scheme as
    * [[graft.operators.Dedup.embeddingNearDupPairs]] (equi-join on
    * (band, code)) and only candidates are scored — the scale path.
    * EXACT duplicates (identical vectors) hash to identical codes in
    * every band, so the scale path's recall on true re-encode/copy
    * pairs is 1.0 by construction, not probabilistically; only
    * below-cos-1 near-pairs are subject to the usual LSH miss rate.
    *
    * Output: (id_a, id_b, dot, is_dup) with id_a < id_b — `dot` the
    * exact long dot product, `is_dup` the integer-exact threshold
    * verdict. Filter `is_dup` for the duplicate set; keep all rows for
    * margin inspection.
    *
    * Magnitude contract: Σv² per vector must satisfy Σv² ≤ 10¹⁹/tDen —
    * then dot and both norms are exact longs (Cauchy-Schwarz bounds
    * |dot| by the norms) and both sides of the squared-products
    * comparison stay under decimal(38,0)'s 10³⁸ ceiling
    * (tDen²·na·nb ≤ 10³⁸). Every content signature in this repo is ≤ a
    * few 1e6 per component at dim ≤ 12 (Σv² ≤ ~1e14), orders of
    * magnitude inside the bound; an out-of-contract input fails LOUDLY
    * with Spark's ANSI decimal-overflow error, never silently.
    * SimilaritySpec pins the verdicts to exact BigInt rational
    * arithmetic across magnitudes up to the bound.
    */
  def integerCosinePairs(df: DataFrame, id: Column, vec: Column,
                         tNum: Long, tDen: Long,
                         bits: Int = 0, bands: Int = 4): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be in (0, 1]: got $tNum/$tDen")
    val coded = df.select(id.as("vec_id"), vec.as("v"))
    val cands =
      if (bits <= 0)
        coded.as("a").join(coded.as("b"),
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("a.v").as("v_a"),
            col("b.vec_id").as("id_b"), col("b.v").as("v_b"))
      else {
        val asDbl = transform(vec, x => x.cast("double"))
        val dim = 64 // srp kernel only needs an upper bound via length;
        val bandCodes = array((0 until bands).map { b =>
          VectorFunctions.srpCode(asDbl, dim, bits, seed = 42L + b)
        }: _*)
        val buckets = df.select(id.as("vec_id"), posexplode(bandCodes))
          .withColumnRenamed("pos", "band_idx")
          .withColumnRenamed("col", "bucket")
        buckets.as("a").join(buckets.as("b"),
            col("a.band_idx") === col("b.band_idx") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .distinct()
          .join(coded.select(col("vec_id").as("id_a"), col("v").as("v_a")),
            "id_a")
          .join(coded.select(col("vec_id").as("id_b"), col("v").as("v_b")),
            "id_b")
      }
    val dot = aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val na = aggregate(transform(col("v_a"), x => x * x),
      lit(0L), (acc, x) => acc + x)
    val nb = aggregate(transform(col("v_b"), x => x * x),
      lit(0L), (acc, x) => acc + x)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val lhs = col("__dot").cast(dec) * col("__dot").cast(dec) *
      lit(tDen * tDen).cast(dec)
    val rhs = lit(tNum * tNum).cast(dec) *
      col("__na").cast(dec) * col("__nb").cast(dec)
    cands
      .withColumn("__dot", dot)
      .withColumn("__na", na)
      .withColumn("__nb", nb)
      .select(col("id_a"), col("id_b"), col("__dot").as("dot"),
        (col("__dot") > 0 && lhs >= rhs).as("is_dup"))
  }
}
