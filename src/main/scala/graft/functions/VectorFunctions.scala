package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` / `array<double>` columns.
  *
  * All math is done in double precision with sequential (index-order)
  * accumulation so results are bit-identical to a plain C loop — which is
  * what ANSI engines (and our DuckDB oracle) compute. For the hot path a
  * codegen'd Catalyst expression can replace the higher-order functions;
  * at current scale the HOF form is adequate and stays declarative.
  */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Sequential-order dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe via double math (0-norm → NaN like the
    * textbook formula). Backed by the codegen kernel — bit-identical to
    * the HOF form [[cosineHof]] (sequential accumulation) but a single
    * compiled loop per row instead of 3 interpreted array traversals.
    */
  def cosine(a: Column, b: Column): Column = Kernels.cosineSim(a, b)

  /** Declarative HOF twin of [[cosine]], kept as the readable reference
    * implementation and for cross-checking the kernel in tests.
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** L2-normalized copy of the vector. */
  def normalize(a: Column): Column = {
    val n = norm2(a)
    transform(asDouble(a), x => x / n)
  }

  /** Signed-random-projection bucket code: `bits` hyperplanes derived
    * deterministically from `seed` via SplittableRandom-style mixing, no
    * data movement — the scale path for cosine LSH bucketing. Backed by
    * the codegen kernel (one compiled pass over bits × dim instead of
    * bits interpreted HOF reductions).
    */
  def srpCode(a: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    Kernels.srpCodeCol(a, dim, bits, seed).as(s"srp$bits")

  /** Max |v_i| clamped away from zero — the symmetric-quantization range.
    * The clamp gives degenerate all-zero vectors a defined result (all-
    * zero codes, scale ~0) instead of a division by zero.
    */
  def quantRange(a: Column): Column =
    greatest(array_max(transform(asDouble(a), x => abs(x))), lit(1e-30))

  /** Symmetric int8 quantization: q_i = floor(v_i * 127 / max|v| + 0.5).
    * `floor(x + 0.5)` rather than `round(x)` on purpose: round() tie
    * semantics differ across engines (half-even vs half-away-from-zero),
    * floor is IEEE-exact everywhere, so external audits reproduce the
    * codes bit-for-bit. 4x smaller vectors for ANN candidate generation
    * / shipping embeddings across the wire; keep float32 for the exact
    * re-rank. Dequantize with q_i * [[quantScale]]. Per-row, no shuffle;
    * two light HOF passes (swap for a codegen kernel at >>100 dims).
    */
  def quantize8(a: Column): Column = {
    val mx = quantRange(a)
    transform(asDouble(a),
      x => floor(x * lit(127.0) / mx + lit(0.5)).cast("tinyint"))
  }

  /** Dequantization scale paired with [[quantize8]]: v_i ~= q_i * scale. */
  def quantScale(a: Column): Column = quantRange(a) / lit(127.0)
}

/** Deterministic pseudo-random hyperplanes (public-domain SplitMix64 mix). */
object SrpPlanes {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** `bits` unit-free hyperplanes of dimension `dim` with entries in
    * (-1, 1), derived from (seed, bit, dim index) — identical on every
    * executor with zero shuffle.
    */
  def planes(dim: Int, bits: Int, seed: Long): Seq[Array[Double]] =
    (0 until bits).map { b =>
      Array.tabulate(dim) { i =>
        val h = mix(seed * 0x100000001b3L + b.toLong * 1000003L + i)
        (h.toDouble / Long.MaxValue.toDouble)
      }
    }
}
