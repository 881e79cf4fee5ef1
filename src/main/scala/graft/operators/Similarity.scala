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
}
