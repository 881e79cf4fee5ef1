package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native per-row kernels for the hot dedup/similarity paths, as custom
  * Catalyst expressions with `doGenCode` (a single static JVM call per
  * row inside WholeStageCodegen).
  *
  * Why not the higher-order-function forms: `transform`/`aggregate`
  * lambdas are evaluated INTERPRETED per array element — a MinHash
  * signature via nested transform costs numHashes × shingles interpreted
  * Expression.eval calls per document (measured: minutes for 5k docs on
  * one core), where this kernel is one tight compiled loop (~ms). At
  * 100 TB, per-row CPU constants dominate once shuffles are right; these
  * kernels keep the whole stage in generated code with zero boxing.
  */
object Kernels {

  // --- JVM kernels (shared by interpreted eval and generated code) ------

  /** MinHash signature: for hash k, min over shingles of
    * xxhash64(shingle bytes, seed) remixed with k. One pass over the
    * shingle bytes; numHashes cheap long remixes per shingle.
    */
  def minhash(shingles: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val n = shingles.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), seed)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashLong(base, k.toLong)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(sig)
  }

  /** Count of positions where two long arrays agree — the MinHash
    * Jaccard-estimate numerator. The HOF form
    * (`size(filter(zip_with(a, b, _ === _), identity))`) evaluates THREE
    * interpreted lambdas per element per candidate pair; this is one
    * compiled loop. Null elements never match (mirrors `===` semantics).
    */
  def agreeCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Exact long dot product over two array<bigint> columns — the
    * integer-arithmetic primitive of the portable embedding twins
    * (quantized cosine verdicts: dot > 0 ∧ c²·dot² ≥ t²·|a|²·|b|²).
    * The HOF form (`aggregate(zip_with(a, b, _ * _), 0L, _ + _)`)
    * evaluates TWO interpreted lambdas per element per candidate pair
    * — at Σ|list|² pair counts that dominates the whole prune; this is
    * one compiled loop. Null elements contribute 0 (a quantized vector
    * has none by construction).
    */
  def longDot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Ascending-sorted sequential sum of an array<double> — the
    * portable deterministic summation (DuckDB twin:
    * `list_sum(list_sort(...))`) as ONE compiled loop. Result is
    * BIT-IDENTICAL to `aggregate(sort_array(xs), 0.0, (acc, x) => acc
    * + x)`: `java.util.Arrays.sort(double[])` and Spark's `sort_array`
    * both order by `java.lang.Double.compare` (-0.0 < 0.0, NaN
    * greatest), and the accumulation is the same left-to-right IEEE
    * addition from 0.0. Exists because the interpreted HOF fold runs
    * once per (query, doc) GROUP in the portable BM25 sum and cost the
    * `hybrid_rrf` oracle twin 14.3× at the 10× fixture (66 s, the
    * whole spread's worst row) — the same kernel-vs-HOF call SCALE.md
    * mandates for every per-group hot path. Null ELEMENTS cannot reach
    * here: [[Kernels.DoubleSortedSum]] rejects containsNull=true arrays
    * at type-check (the HOF returns NULL on a null element — skipping
    * would diverge from the claimed bit-identity); the in-loop null
    * guard is defense-in-depth only.
    */
  def sortedSum(arr: ArrayData): Double = {
    val n = arr.numElements()
    val a = new Array[Double](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { a(m) = arr.getDouble(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(a, 0, m)
    var s = 0.0
    i = 0
    while (i < m) { s += a(i); i += 1 }
    s
  }

  /** Per-document word n-gram repetition stats — the "repetitious
    * document" quality filters of the MassiveText/Gopher curation recipe
    * (Rae et al. 2021, appendix A1.1: fraction of duplicate n-grams and
    * fraction covered by the most frequent n-gram): returns
    * [total, distinct, maxCount] over the document's word `n`-grams
    * ([0,0,0] when the document has fewer than n tokens). Like simhash
    * this is a per-document REDUCTION, so the operator needs NO shuffle
    * at all — the explode+groupBy formulation (what the DuckDB oracle
    * runs) shuffles every n-gram of the corpus instead. Counts are over
    * the actual n-gram STRINGS (a per-row hash map), not their hashes,
    * so the result is exact.
    */
  def repetition(tokens: ArrayData, n: Int): ArrayData = {
    val nTok = tokens.numElements()
    val total = nTok - n + 1
    if (total <= 0) return new GenericArrayData(Array(0, 0, 0))
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder()
    var maxC = 0
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val t = tokens.getUTF8String(i + j)
        if (t != null) sb.append(t.toString)
        j += 1
      }
      val g = sb.toString
      val prev = counts.get(g)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(g, Integer.valueOf(c))
      if (c > maxC) maxC = c
      i += 1
    }
    new GenericArrayData(Array(total, counts.size(), maxC))
  }

  /** 64-bit SimHash: each token's FNV-1a hash votes ±1 per bit; the sign
    * of the per-bit sum forms the code. One pass, no shuffle needed at
    * all — SimHash is a per-document reduction.
    */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = Fnv64.hash(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var code = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) code |= (1L << b)
      b += 1
    }
    code
  }

  /** Portable SimHash twin of [[simhash]]: per-bit votes come from the
    * first 64 bits of md5(token) — the value any SQL engine derives as
    * `substr(md5(t), 1, 16)` read as hex — instead of FNV-1a, so the
    * code, and with it the pigeonhole pair set (which is EXACT at a
    * given code function), reproduces bit-for-bit in DuckDB. Same vote
    * semantics: +1 per set bit per token occurrence, code bit = sign
    * of the vote sum (ties clear). ~5-10x FNV's per-token cost; the
    * FNV form stays the production default.
    */
  def simhashMd5(tokens: ArrayData): Long = {
    val md = md5Local.get()
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 8 digest bytes big-endian == first 16 hex chars of md5
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var code = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) code |= (1L << b)
      b += 1
    }
    code
  }

  /** Winnowing fingerprint (Schleimer et al. 2003): FNV-1a over char
    * k-grams, min of each w-window (O(n) monotonic-deque sliding
    * minimum), distinct + sorted.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    // k-grams are CODE POINTS (matching Spark's substring and therefore
    // TextFunctions.charShingles), not UTF-16 units — astral characters
    // must not be split across surrogate pairs
    val cps = s.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = Fnv64.hash(UTF8String.fromString(
        new String(cps, i, k)))
      i += 1
    }
    val nWins = nGrams - w + 1
    val mins =
      if (nWins <= 0) Array(hashes.min)
      else {
        // sliding-window minimum via monotonic deque: O(n), not O(n*w)
        val out = new Array[Long](nWins)
        val dq = new Array[Int](nGrams)
        var head = 0
        var tail = 0
        var j = 0
        while (j < nGrams) {
          while (tail > head && hashes(dq(tail - 1)) >= hashes(j)) tail -= 1
          dq(tail) = j; tail += 1
          if (dq(head) <= j - w) head += 1
          if (j >= w - 1) out(j - w + 1) = hashes(dq(head))
          j += 1
        }
        out
      }
    new GenericArrayData(mins.distinct.sorted)
  }

  /** Portable MinHash twin of [[minhash]]: hash k of shingle s is the
    * first 16 hex chars of `md5(s || ':' || k)` — the value any SQL
    * engine derives as `substr(md5(s || ':' || k), 1, 16)` — and the
    * signature element is the LEXICOGRAPHIC min over the document's
    * shingles. Fixed-width lowercase hex orders identically to the
    * unsigned 64-bit value it encodes under JVM `compareTo`, Spark
    * UTF8String binary order and DuckDB varchar order, so the whole
    * signature (and every downstream band key and agree-count) is
    * engine-exact. ~10x the xxhash kernel's cost per (shingle, k) —
    * oracle-anchor use; [[minhash]] stays the production default.
    * Output: array<string> of 16-hex elements; empty for shingle-less
    * docs (mirrors [[minhash]]'s empty-input contract).
    */
  def minhashMd5(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val md = md5Local.get()
    val suf = md5Suffixes(numHashes)
    val sig = new Array[String](numHashes)
    var any = false
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        any = true
        // byte-level feed: UTF-8(s || ":k") == UTF-8(s) ++ UTF-8(":k"),
        // so updating with the two arrays digests the identical message
        // — without re-encoding the shingle numHashes times per row
        val sBytes = s.getBytes
        var k = 0
        while (k < numHashes) {
          md.reset()
          md.update(sBytes)
          md.update(suf(k))
          val d = md.digest()
          val out = new Array[Char](16)
          var j = 0
          while (j < 8) {
            out(2 * j) = Character.forDigit((d(j) >> 4) & 0xf, 16)
            out(2 * j + 1) = Character.forDigit(d(j) & 0xf, 16)
            j += 1
          }
          val h = new String(out)
          if (sig(k) == null || h.compareTo(sig(k)) < 0) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.empty[UTF8String])
    else new GenericArrayData(sig.map(UTF8String.fromString))
  }

  // ":k" suffix bytes per hash index, grown on demand and shared across
  // threads (rebuild race is benign — contents are deterministic)
  @volatile private var md5SuffixCache: Array[Array[Byte]] = Array.empty
  private def md5Suffixes(n: Int): Array[Array[Byte]] = {
    var c = md5SuffixCache
    if (c.length < n) {
      c = Array.tabulate(n)(k =>
        (":" + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md5SuffixCache = c
    }
    c
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def md5Hex16(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = Character.forDigit((d(i) >> 4) & 0xf, 16)
      out(2 * i + 1) = Character.forDigit(d(i) & 0xf, 16)
      i += 1
    }
    new String(out)
  }

  /** Portable winnowing twin of [[winnow]]: fingerprints are the first
    * 16 hex chars (64 bits) of `md5(k-gram)` instead of FNV-1a engine
    * hashes, so any SQL engine reproduces them exactly —
    * `substr(md5(g), 1, 16)` in DuckDB, and lowercase ASCII hex strings
    * compare identically under JVM `compareTo`, Spark UTF8 binary order
    * and DuckDB varchar order, which makes the sliding MIN and the
    * distinct ascending output portable too. Window semantics are
    * IDENTICAL to [[winnow]]: code-point k-grams, min per w-window,
    * min-of-all for docs with 1..w-1 grams, empty for gram-less docs.
    * ~5-10x the per-gram cost of FNV — use for oracle-checked runs; the
    * engine-hash form stays the production default.
    */
  def winnowMd5(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[UTF8String])
    val md = md5Local.get()
    val hashes = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = md5Hex16(md, new String(cps, i, k))
      i += 1
    }
    val nWins = nGrams - w + 1
    val mins =
      if (nWins <= 0) Array(hashes.min)
      else {
        // same monotonic-deque sliding minimum as winnow, string keys
        val out = new Array[String](nWins)
        val dq = new Array[Int](nGrams)
        var head = 0
        var tail = 0
        var j = 0
        while (j < nGrams) {
          while (tail > head && hashes(dq(tail - 1)).compareTo(hashes(j)) >= 0) tail -= 1
          dq(tail) = j; tail += 1
          if (dq(head) <= j - w) head += 1
          if (j >= w - 1) out(j - w + 1) = hashes(dq(head))
          j += 1
        }
        out
      }
    new GenericArrayData(mins.distinct.sorted.map(UTF8String.fromString))
  }

  /** Cosine similarity with sequential double accumulation — bit-identical
    * to the HOF form (and to DuckDB's list kernels), so oracle hashes are
    * preserved. Returns null (boxed) when either vector contains a null
    * element, matching the HOF form's null propagation — reading a null
    * slot as 0.0 would silently skew scores.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloats: Boolean,
             bFloats: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloats) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloats) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Signed-random-projection code over all `bits` hyperplanes in one
    * pass; planes are derived deterministically from (seed, bit, index)
    * exactly like [[SrpPlanes.planes]]. Null elements contribute 0.0 to
    * the projection (bucket assignment stays total — a null-bearing
    * vector still lands in SOME bucket; exact verification downstream
    * decides its fate).
    */
  def srpCode(v: ArrayData, dim: Int, bits: Int, seed: Long,
              floats: Boolean): Long = {
    var code = 0L
    val n = math.min(dim, v.numElements())
    var b = 0
    while (b < bits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (v.isNullAt(i)) 0.0
          else if (floats) v.getFloat(i).toDouble else v.getDouble(i)
        val h = SrpPlanes.mix(seed * 0x100000001b3L + b.toLong * 1000003L + i)
        proj += x * (h.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (proj >= 0) code |= (1L << b)
      b += 1
    }
    code
  }

  /** Cosine of a row vector against one dense double centroid, sequential
    * accumulation like [[cosine]]. Null elements contribute 0.0 (bucket
    * assignment stays total, mirroring [[srpCode]]'s convention — every
    * vector lands in SOME list; exact rerank downstream decides its fate).
    * Degenerate vectors (zero/empty/all-null on either side) get a defined
    * similarity of -1.0 instead of 0/0=NaN, so the argmin/top-k kernels
    * stay total orderings.
    */
  def cosineDense(v: ArrayData, c: Array[Double], floats: Boolean): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0.0
        else if (floats) v.getFloat(i).toDouble else v.getDouble(i)
      val y = c(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) -1.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Argmax-cosine centroid index: one compiled pass over nlist × dim per
    * row, ties to the LOWER index (same contract as the former
    * crossJoin + row_number plan: cosine DESC, list_id ASC). This is the
    * kernel that makes IVF assignment shuffle-free — no row inflation, no
    * exchange, just a per-row scalar.
    */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]],
                      floats: Boolean): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var k = 0
    while (k < cents.length) {
      val sim = cosineDense(v, cents(k), floats)
      if (sim > bestSim) { bestSim = sim; best = k }
      k += 1
    }
    best
  }

  /** The `n` nearest centroid indices, cosine DESC with ties to the lower
    * index — the probe-list kernel for IVF queries. Partial selection
    * (n passes over nlist) — n is nprobe, single digits in practice.
    */
  def topCentroids(v: ArrayData, cents: Array[Array[Double]], n: Int,
                   floats: Boolean): ArrayData = {
    val nlist = cents.length
    val sims = new Array[Double](nlist)
    var k = 0
    while (k < nlist) {
      // NaN (a NaN element in the data) would make every `>` comparison
      // false and leave `best` at -1; clamp to -Inf so the selection
      // below stays a total order, like nearestCentroid's.
      val s = cosineDense(v, cents(k), floats)
      sims(k) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      k += 1
    }
    val take = math.min(n, nlist)
    val out = new Array[Int](take)
    val used = new Array[Boolean](nlist)
    var r = 0
    while (r < take) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      k = 0
      while (k < nlist) {
        if (!used(k) && (best < 0 || sims(k) > bestSim)) { bestSim = sims(k); best = k }
        k += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Dense linear projection: out_c = Σ_i (v_i − mean_i) · comps_c_i —
    * the per-row kernel under PCA/whitening transforms. One compiled
    * pass of k × dim multiply-adds per row, no allocation beyond the
    * k-length output; centering is fused into the loop so the centered
    * vector is never materialized. Null elements are read as 0.0 (the
    * [[cosineDense]] convention); a wrong-length vector fails loudly —
    * a silently truncated projection would skew every downstream
    * distance.
    */
  def projectDense(v: ArrayData, mean: Array[Double],
                   comps: Array[Array[Double]], floats: Boolean): ArrayData = {
    val dim = mean.length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"project_dense(dim=$dim) got a vector of length ${v.numElements()}")
    val k = comps.length
    val centered = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val x = if (v.isNullAt(i)) 0.0
        else if (floats) v.getFloat(i).toDouble else v.getDouble(i)
      centered(i) = x - mean(i)
      i += 1
    }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val comp = comps(c)
      var acc = 0.0
      i = 0
      while (i < dim) { acc += centered(i) * comp(i); i += 1 }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization encode: L2-normalize `v`, then for each of the
    * `cb.length` subspaces pick the argmin squared-L2 codeword (ties to
    * the lower code — deterministic on any partitioning). Normalizing
    * INSIDE the kernel keeps the fit/encode/score contract in one place:
    * codebooks are trained on normalized vectors, so
    * dot(q̂, reconstruction) ≈ cosine(q, v) and no caller can encode
    * unnormalized data against a normalized model. One compiled pass of
    * m × k × subdim multiplies per row, no allocation beyond the code
    * array — the 100-TB write-path kernel that turns a 256-byte float
    * vector into m int codes (m bytes on disk after parquet packs them).
    */
  def pqEncode(v: ArrayData, cb: Array[Array[Array[Double]]],
               floats: Boolean): ArrayData = {
    val m = cb.length
    val subdim = cb(0)(0).length
    val dim = m * subdim
    val x = new Array[Double](dim)
    val n = math.min(v.numElements(), dim)
    var i = 0
    var norm = 0.0
    while (i < n) {
      val e = if (v.isNullAt(i)) 0.0
        else if (floats) v.getFloat(i).toDouble else v.getDouble(i)
      x(i) = e; norm += e * e; i += 1
    }
    norm = math.sqrt(norm)
    if (norm > 0) { i = 0; while (i < dim) { x(i) /= norm; i += 1 } }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = cb(j)
      val off = j * subdim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val ce = cents(c)
        var d = 0.0
        var t = 0
        while (t < subdim) {
          val diff = x(off + t) - ce(t); d += diff * diff; t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance score: dot(normalize(q), PQ reconstruction of
    * `codes`) ≈ cosine(q, original vector). The query is exact, only the
    * corpus side is quantized — the standard ADC trade (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search"). Zero-norm
    * queries score -1.0, matching [[cosineDense]]'s no-direction
    * contract. Codes outside [0, k) clamp to the last codeword rather
    * than throw: a corrupt store row should rank low, not kill the job.
    */
  def pqAdcScore(q: ArrayData, codes: ArrayData,
                 cb: Array[Array[Array[Double]]], floats: Boolean): Double = {
    val m = cb.length
    val subdim = cb(0)(0).length
    val dim = m * subdim
    val x = new Array[Double](dim)
    val n = math.min(q.numElements(), dim)
    var i = 0
    var norm = 0.0
    while (i < n) {
      val e = if (q.isNullAt(i)) 0.0
        else if (floats) q.getFloat(i).toDouble else q.getDouble(i)
      x(i) = e; norm += e * e; i += 1
    }
    norm = math.sqrt(norm)
    if (norm == 0.0) return -1.0
    var score = 0.0
    val mc = math.min(m, codes.numElements())
    var j = 0
    while (j < mc) {
      val cents = cb(j)
      val raw = if (codes.isNullAt(j)) 0 else codes.getInt(j)
      val ce = cents(math.min(math.max(raw, 0), cents.length - 1))
      val off = j * subdim
      var t = 0
      while (t < subdim) { score += x(off + t) / norm * ce(t); t += 1 }
      j += 1
    }
    score
  }

  /** Apply ONE BPE merge to a token stream, greedy left-to-right over
    * NON-overlapping occurrences: each adjacent (a, b) collapses into
    * the single token a+sep+b, and the right element of a merge cannot
    * start the next one — "a a a" under (a, a) merges to [a·a, a], the
    * standard BPE trainer contract. Null elements pass through and
    * never participate in a merge.
    */
  def mergeTokens(tokens: ArrayData, a: UTF8String, b: UTF8String,
                  sep: UTF8String): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val cur = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      val canPair = cur != null && i + 1 < n && !tokens.isNullAt(i + 1)
      if (canPair && cur.equals(a) && tokens.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(cur, sep, tokens.getUTF8String(i + 1)))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Apply an ORDERED merge table in one kernel call — the BPE ENCODE
    * path. Each merge is one greedy left-to-right non-overlapping pass
    * (identical semantics to iterating [[mergeTokens]]), but the loop
    * runs over a reused scratch array inside a single compiled
    * expression: a 30k-merge vocabulary is 30k in-kernel passes, NOT
    * 30k nested plan nodes — the plan stays one leaf + one projection
    * regardless of vocabulary size, which is what makes encoding a
    * 100-TB corpus with a production merge table plannable at all.
    * Merges whose pair never occurs cost one scan of the (shrinking)
    * token array each.
    */
  def mergeTokensAll(tokens: ArrayData, a: Array[UTF8String],
                     b: Array[UTF8String], sep: UTF8String): ArrayData = {
    var n = tokens.numElements()
    val cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      cur(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    var m = 0
    while (m < a.length) {
      val am = a(m); val bm = b(m)
      var r = 0; var w = 0
      while (r < n) {
        val c = cur(r)
        if (c != null && r + 1 < n && cur(r + 1) != null &&
            c.equals(am) && cur(r + 1).equals(bm)) {
          cur(w) = UTF8String.concat(c, sep, cur(r + 1))
          r += 2
        } else {
          cur(w) = c
          r += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    val out = new Array[AnyRef](n)
    i = 0
    while (i < n) { out(i) = cur(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Count single-space-delimited tokens of `text` that are members of
    * `words` (exact string equality, empties kept — the same token
    * universe as TextFunctions.tokens). One pass, no allocation beyond
    * the substring probes.
    */
  def tokenSetCount(text: UTF8String, words: java.util.HashSet[String]): Int = {
    val s = text.toString
    var count = 0
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (words.contains(s.substring(start, i))) count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }

  /** Count single-space-delimited tokens containing at least one ASCII
    * letter — the Gopher "fraction of words with an alphabetic character"
    * numerator (Rae et al. 2021, A1.1), over the same token universe as
    * [[tokenSetCount]] (empties kept). One pass, no allocation.
    */
  def alphaTokenCount(text: UTF8String): Int = {
    val s = text.toString
    var count = 0
    var hasAlpha = false
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (hasAlpha) count += 1
        hasAlpha = false
      } else {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
      }
      i += 1
    }
    count
  }

  /** Count maximal runs of [a-z] — exactly what
    * regexp_extract_all(c, '[a-z]+') produces, without the regex engine.
    */
  def asciiRunCount(text: UTF8String): Int = {
    val s = text.toString
    var count = 0
    var inRun = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isLower = c >= 'a' && c <= 'z'
      if (isLower && !inRun) { count += 1; inRun = true }
      else if (!isLower) inRun = false
      i += 1
    }
    count
  }

  /** True iff ANY shingle is (probably) in the Bloom filter — the
    * stateless decontamination probe: one pass, early exit on first
    * hit. Hashing MUST mirror the build side (xxhash64 of the UTF-8
    * bytes, Spark's default seed 42, then putLong/mightContainLong).
    */
  def bloomAnyMember(shingles: ArrayData,
                     bloom: org.apache.spark.util.sketch.BloomFilter): Boolean = {
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 42L)
        if (bloom.mightContainLong(h)) return true
      }
      i += 1
    }
    false
  }

  /** Per-executor-thread Deflater, reset per row: Deflater construction
    * allocates native zlib state — per-row allocation would dominate the
    * kernel. Never end()ed; one small native block per executor thread
    * for the executor's lifetime.
    */
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }

  /** Deflate compression ratio of the UTF-8 bytes: compressed/raw.
    * Low ratio = repetitive/templated text — the compressibility
    * quality heuristic of web-corpus curation (boilerplate and spam
    * compress far better than natural prose). Deterministic for a
    * fixed JVM's zlib, but NOT engine-portable (different zlib builds
    * emit different streams), so queries over it are rows-only
    * checkable. Empty text -> 1.0.
    *
    * Worst-case bound: deflate falls back to stored blocks (5-byte
    * header per <=65535-byte block), so compressed <= n + 5*ceil(n/65535)
    * + a few fixed-code bytes; the ratio can exceed 2 for TINY inputs
    * (1 raw byte deflates to 3 on this JVM) and is only bounded by
    * ~1 + c/n in general — assertions over it must scale the tolerance
    * by input length, not assume a constant ceiling.
    */
  def deflateRatio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  // Count-min probe support. Deserializing the sketch per probed row
  // would dominate any probe join, so sketches are memoized PER
  // EXECUTOR. The cache key is a cheap fingerprint — length mixed with
  // a hardware CRC32C of the bytes — NOT full-content hash/equals: the
  // former ByteBuffer key paid a byte-by-byte hashCode scan of the
  // ~110 KB sketch (eps=0.001) on EVERY probed row, which contradicted
  // the "per-row cost is the depth×hash walk" contract. A fingerprint
  // hit still verifies with Arrays.equals (a vectorized intrinsic, an
  // order of magnitude cheaper than the boxed hashCode loop), so a
  // CRC collision degrades to re-deserialization, never a wrong
  // estimate. Bounded: a pipeline carries a handful of live sketches
  // (one per group); the clear() guard only exists so a pathological
  // caller cycling thousands of sketches degrades to
  // re-deserialization instead of leaking (racy by design — losers of
  // the race merely re-deserialize).
  private val cmsCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long,
      (Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]()

  private def cmsFingerprint(bytes: Array[Byte]): Long = {
    val crc = new java.util.zip.CRC32C()
    crc.update(bytes, 0, bytes.length)
    (bytes.length.toLong << 32) ^ crc.getValue
  }

  /** Estimated count of `item` in a serialized
    * `org.apache.spark.util.sketch.CountMinSketch` (the binary the
    * built-in `count_min_sketch` aggregate emits). Probes with the
    * item's UTF-8 bytes — exactly how the aggregate added string items,
    * so estimates are consistent with the build side.
    */
  def countMinEstimate(sketchBytes: Array[Byte], item: UTF8String): Long = {
    val key = java.lang.Long.valueOf(cmsFingerprint(sketchBytes))
    val hit = cmsCache.get(key)
    val cms =
      if (hit != null && java.util.Arrays.equals(hit._1, sketchBytes)) hit._2
      else {
        if (cmsCache.size > 64) cmsCache.clear()
        val fresh = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sketchBytes))
        cmsCache.put(key, (sketchBytes, fresh))
        fresh
      }
    cms.estimateCount(item.getBytes)
  }

  /** (x, y) → Hilbert curve index on a 2^bits × 2^bits grid, the
    * standard per-level rotate/reflect walk (Hilbert 1891; the loop is
    * the widely-published xy2d form): at each scale s = 2^b the quadrant
    * contributes s²·((3·rx) xor ry) and the sub-square is rotated into
    * canonical orientation. Inputs are masked to the low `bits` bits.
    * A tight JVM loop, because the rotation makes each level's (x, y)
    * depend on BOTH previous coordinates — as a Column expression tree
    * the unrolling doubles per level (2^bits nodes); as SQL it stays
    * linear only because CTE steps materialize rows (the oracle's
    * unrolled form).
    */
  def hilbert(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the sub-square
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}

  private def requireType(name: String, e: Expression,
                          ok: DataType => Boolean,
                          want: String): TypeCheckResult =
    if (ok(e.dataType)) TypeCheckSuccess
    else TypeCheckFailure(s"$name requires $want, got ${e.dataType.simpleString}")

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }
  private def isNumericVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  // --- Catalyst expressions --------------------------------------------

  case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhash(input.asInstanceOf[ArrayData], numHashes, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.minhash($c, $numHashes, ${seed}L)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  case class MinHashMd5Sig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "minhash_md5_sig"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhashMd5(input.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.minhashMd5($c, $numHashes)")
    override protected def withNewChildInternal(newChild: Expression): MinHashMd5Sig =
      copy(child = newChild)
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.simhash(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  case class SimHashMd5(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_md5"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.simhashMd5(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhashMd5($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
      copy(child = newChild)
  }

  case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, _ == StringType, "string")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.winnow(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnow($c, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): Winnow =
      copy(child = newChild)
  }

  case class WinnowMd5(child: Expression, k: Int, w: Int) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, _ == StringType, "string")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "winnow_md5"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.winnowMd5(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnowMd5($c, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): WinnowMd5 =
      copy(child = newChild)
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    // per-side element type: mixed float/double pairs are legal (e.g. a
    // float corpus against double k-means centroids)
    private lazy val aFloats = isFloatArray(left)
    private lazy val bFloats = isFloatArray(right)
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(prettyName, left, isNumericVector, "array<float|double>")
      if (l != TypeCheckSuccess) l
      else requireType(prettyName, right, isNumericVector, "array<float|double>")
    }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // null elements propagate null
    override def prettyName: String = "cosine_sim"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        aFloats, bFloats)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("cosBoxed")
        s"""java.lang.Double $boxed =
           |  graft.functions.Kernels.cosine($a, $b, $aFloats, $bFloats);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.doubleValue(); }""".stripMargin
      })
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  case class AgreeCount(left: Expression, right: Expression)
      extends BinaryExpression {
    private def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(prettyName, left, isLongArray, "array<bigint>")
      if (l != TypeCheckSuccess) l
      else requireType(prettyName, right, isLongArray, "array<bigint>")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "agree_count"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.agreeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.Kernels.agreeCount($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): AgreeCount =
      copy(left = newLeft, right = newRight)
  }

  case class LongDot(left: Expression, right: Expression)
      extends BinaryExpression {
    private def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(prettyName, left, isLongArray, "array<bigint>")
      if (l != TypeCheckSuccess) l
      else requireType(prettyName, right, isLongArray, "array<bigint>")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "long_dot"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.Kernels.longDot($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): LongDot =
      copy(left = newLeft, right = newRight)
  }

  /** [[Kernels.sortedSum]] as a codegen expression — see its scaladoc
    * for the bit-identity argument vs the `sort_array` + HOF-fold
    * formulation it replaces.
    */
  case class DoubleSortedSum(child: Expression) extends UnaryExpression {
    // containsNull=true is REJECTED, not skipped: the kernel drops null
    // elements, but the `aggregate(sort_array(xs), 0.0, _ + _)` HOF it
    // claims bit-identity with returns NULL the moment any element is
    // null — accepting nullable arrays would let the two formulations
    // silently diverge outside the collect_list call sites (which emit
    // containsNull=false by construction). Null-tolerant callers must
    // filter/assert their arrays first, visibly.
    private def isDoubleArray(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, false) => true
      case _                            => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isDoubleArray,
        "array<double> with containsNull=false")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "double_sorted_sum"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.sortedSum(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.sortedSum($c)")
    override protected def withNewChildInternal(
        newChild: Expression): DoubleSortedSum =
      copy(child = newChild)
  }

  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    private def isIntegral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
      val l = requireType(prettyName, left, isIntegral, "integral")
      if (l != TypeCheckSuccess) l
      else requireType(prettyName, right, isIntegral, "integral")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "hilbert_index"
    private def asLong(v: Any): Long = v match {
      case b: Byte  => b.toLong
      case s: Short => s.toLong
      case i: Int   => i.toLong
      case l: Long  => l
    }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.hilbert(asLong(a), asLong(b), bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.Kernels.hilbert((long) $a, (long) $b, $bits)")
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): HilbertIndex =
      copy(left = newLeft, right = newRight)
  }

  case class SrpCode(child: Expression, dim: Int, bits: Int, seed: Long)
      extends UnaryExpression {
    private lazy val floats = isFloatArray(child)
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isNumericVector, "array<float|double>")
    override def dataType: DataType = LongType
    override def prettyName: String = "srp_code"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.srpCode(input.asInstanceOf[ArrayData], dim, bits, seed, floats)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.srpCode($c, $dim, $bits, ${seed}L, $floats)")
    override protected def withNewChildInternal(newChild: Expression): SrpCode =
      copy(child = newChild)
  }

  // Centroids are held as Seq[Seq[Double]] (structural equals/hashCode —
  // Array fields would defeat common-subexpression elimination and plan
  // canonicalization) and materialized once per expression instance as a
  // primitive matrix for the eval/codegen hot path.
  case class NearestCentroidIdx(child: Expression,
                                centroids: Seq[Seq[Double]])
      extends UnaryExpression {
    private lazy val floats = isFloatArray(child)
    @transient private lazy val cArr: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isNumericVector, "array<float|double>")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.nearestCentroid(input.asInstanceOf[ArrayData], cArr, floats)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("ivfCentroids", cArr, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.nearestCentroid($c, $cRef, $floats)")
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCentroidIdx =
      copy(child = newChild)
  }

  case class TopCentroidsIdx(child: Expression,
                             centroids: Seq[Seq[Double]], n: Int)
      extends UnaryExpression {
    private lazy val floats = isFloatArray(child)
    @transient private lazy val cArr: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isNumericVector, "array<float|double>")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "top_centroids"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.topCentroids(input.asInstanceOf[ArrayData], cArr, n, floats)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("ivfCentroids", cArr, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.topCentroids($c, $cRef, $n, $floats)")
    }
    override protected def withNewChildInternal(newChild: Expression): TopCentroidsIdx =
      copy(child = newChild)
  }

  // Mean/components as Seqs for the same canonicalization reason as
  // NearestCentroidIdx's centroids; primitive arrays materialized once.
  case class ProjectDenseExpr(child: Expression, mean: Seq[Double],
                              comps: Seq[Seq[Double]])
      extends UnaryExpression {
    private lazy val floats = isFloatArray(child)
    @transient private lazy val mArr: Array[Double] = mean.toArray
    @transient private lazy val cArr: Array[Array[Double]] =
      comps.map(_.toArray).toArray
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isNumericVector, "array<float|double>")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "project_dense"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.projectDense(input.asInstanceOf[ArrayData], mArr, cArr, floats)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("projMean", mArr, "double[]")
      val cRef = ctx.addReferenceObj("projComps", cArr, "double[][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.projectDense($c, $mRef, $cRef, $floats)")
    }
    override protected def withNewChildInternal(newChild: Expression): ProjectDenseExpr =
      copy(child = newChild)
  }

  // Codebooks as Seq-of-Seq-of-Seq for the same canonicalization reason
  // as NearestCentroidIdx's centroids; primitive matrix materialized once.
  case class PqEncodeExpr(child: Expression,
                          codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    private lazy val floats = isFloatArray(child)
    @transient private lazy val cbArr: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isNumericVector, "array<float|double>")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.pqEncode(input.asInstanceOf[ArrayData], cbArr, floats)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[][][]")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.pqEncode($c, $cRef, $floats)")
    }
    override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
      copy(child = newChild)
  }

  case class PqAdcScoreExpr(left: Expression, right: Expression,
                            codebooks: Seq[Seq[Seq[Double]]])
      extends BinaryExpression {
    private lazy val floats = isFloatArray(left)
    @transient private lazy val cbArr: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(prettyName, left, isNumericVector, "array<float|double>")
      if (l != TypeCheckSuccess) l
      else requireType(prettyName, right,
        { // parquet read-back declares elements nullable — accept both
          case ArrayType(IntegerType, _) => true
          case _ => false
        }, "array<int> (pq codes)")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc_score"
    override protected def nullSafeEval(q: Any, codes: Any): Any =
      Kernels.pqAdcScore(q.asInstanceOf[ArrayData],
        codes.asInstanceOf[ArrayData], cbArr, floats)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[][][]")
      defineCodeGen(ctx, ev, (q, c) =>
        s"graft.functions.Kernels.pqAdcScore($q, $c, $cRef, $floats)")
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): PqAdcScoreExpr =
      copy(left = newLeft, right = newRight)
  }

  case class MergeTokensExpr(child: Expression, a: String, b: String,
                             sep: String) extends UnaryExpression {
    @transient private lazy val aU = UTF8String.fromString(a)
    @transient private lazy val bU = UTF8String.fromString(b)
    @transient private lazy val sepU = UTF8String.fromString(sep)
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "merge_tokens"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.mergeTokens(input.asInstanceOf[ArrayData], aU, bU, sepU)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val t = "org.apache.spark.unsafe.types.UTF8String"
      val aRef = ctx.addReferenceObj("mergeA", aU, t)
      val bRef = ctx.addReferenceObj("mergeB", bU, t)
      val sRef = ctx.addReferenceObj("mergeSep", sepU, t)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.mergeTokens($c, $aRef, $bRef, $sRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): MergeTokensExpr =
      copy(child = newChild)
  }

  // Merge table as Seq-of-pairs for plan canonicalization (the
  // NearestCentroidIdx convention); primitive UTF8String arrays
  // materialized once per expression instance.
  case class MergeTokensAllExpr(child: Expression,
                                merges: Seq[(String, String)], sep: String)
      extends UnaryExpression {
    @transient private lazy val aArr: Array[UTF8String] =
      merges.map(p => UTF8String.fromString(p._1)).toArray
    @transient private lazy val bArr: Array[UTF8String] =
      merges.map(p => UTF8String.fromString(p._2)).toArray
    @transient private lazy val sepU = UTF8String.fromString(sep)
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "merge_tokens_all"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.mergeTokensAll(input.asInstanceOf[ArrayData], aArr, bArr, sepU)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val t = "org.apache.spark.unsafe.types.UTF8String"
      val aRef = ctx.addReferenceObj("mergeAs", aArr, s"$t[]")
      val bRef = ctx.addReferenceObj("mergeBs", bArr, s"$t[]")
      val sRef = ctx.addReferenceObj("mergeSep", sepU, t)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.mergeTokensAll($c, $aRef, $bRef, $sRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): MergeTokensAllExpr =
      copy(child = newChild)
  }

  // --- Column wrappers --------------------------------------------------

  def minhashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes, seed))

  def minhashMd5SigCol(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashMd5Sig(ColumnBridge.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def simhashMd5Col(tokens: Column): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(tokens)))

  def winnowFp(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(Winnow(ColumnBridge.expression(text), k, w))

  def winnowMd5Fp(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowMd5(ColumnBridge.expression(text), k, w))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def agreeCountCol(a: Column, b: Column): Column =
    ColumnBridge.column(AgreeCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def longDotCol(a: Column, b: Column): Column =
    ColumnBridge.column(LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedSumCol(a: Column): Column =
    ColumnBridge.column(DoubleSortedSum(ColumnBridge.expression(a)))

  def hilbertCol(x: Column, y: Column, bits: Int = 16): Column =
    ColumnBridge.column(HilbertIndex(ColumnBridge.expression(x),
      ColumnBridge.expression(y), bits))

  def srpCodeCol(v: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(SrpCode(ColumnBridge.expression(v), dim, bits, seed))

  def mergeTokensCol(tokens: Column, a: String, b: String,
                     sep: String = ""): Column =
    ColumnBridge.column(MergeTokensExpr(ColumnBridge.expression(tokens),
      a, b, sep))

  def mergeTokensAllCol(tokens: Column, merges: Seq[(String, String)],
                        sep: String = ""): Column =
    ColumnBridge.column(MergeTokensAllExpr(ColumnBridge.expression(tokens),
      merges, sep))

  def pqEncodeCol(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(v),
      codebooks.map(_.map(_.toSeq).toSeq).toSeq))

  def pqAdcScoreCol(q: Column, codes: Column,
                    codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcScoreExpr(ColumnBridge.expression(q),
      ColumnBridge.expression(codes),
      codebooks.map(_.map(_.toSeq).toSeq).toSeq))

  def nearestCentroidCol(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidIdx(ColumnBridge.expression(v),
      centroids.map(_.toSeq).toSeq))

  def topCentroidsCol(v: Column, centroids: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(TopCentroidsIdx(ColumnBridge.expression(v),
      centroids.map(_.toSeq).toSeq, n))

  def projectDenseCol(v: Column, mean: Array[Double],
                      comps: Array[Array[Double]]): Column =
    ColumnBridge.column(ProjectDenseExpr(ColumnBridge.expression(v),
      mean.toSeq, comps.map(_.toSeq).toSeq))

  case class TokenSetCount(child: Expression, words: Seq[String])
      extends UnaryExpression {
    @transient private lazy val wordSet: java.util.HashSet[String] = {
      val set = new java.util.HashSet[String]()
      words.foreach(set.add)
      set
    }
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, _ == StringType, "string")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "token_set_count"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.tokenSetCount(input.asInstanceOf[UTF8String], wordSet)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wordsRef = ctx.addReferenceObj("tscWords", wordSet,
        "java.util.HashSet<String>")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.tokenSetCount($c, $wordsRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
      copy(child = newChild)
  }

  case class NgramRepetition(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "ngram_repetition"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.repetition(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.repetition($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
      copy(child = newChild)
  }

  /** Array field => reference equality, so two instances never compare
    * equal and CSE can't merge them — acceptable for the intended
    * one-probe-per-gate filter usage, and it avoids boxing multi-MB
    * sketch bytes into a Seq.
    */
  case class BloomContainsAny(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression {
    @transient private lazy val bloom =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, isStringArray, "array<string>")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_contains_any"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.bloomAnyMember(input.asInstanceOf[ArrayData], bloom)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bloomRef = ctx.addReferenceObj("gateBloom", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Kernels.bloomAnyMember($c, $bloomRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomContainsAny =
      copy(child = newChild)
  }

  /** Probe a serialized count-min sketch for a string item's estimated
    * count. Codegen'd to one static call; the deserialized sketch is
    * executor-memoized ([[Kernels.countMinEstimate]]), so per-row cost
    * after the first probe of a sketch is the CMS depth×hash walk.
    */
  case class CountMinEstimate(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(prettyName, left, _ == BinaryType, "binary")
      if (l != TypeCheckSuccess) l
      else requireType(prettyName, right, _ == StringType, "string")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "count_min_estimate"
    override protected def nullSafeEval(s: Any, i: Any): Any =
      Kernels.countMinEstimate(s.asInstanceOf[Array[Byte]],
        i.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (s, i) => s"graft.functions.Kernels.countMinEstimate($s, $i)")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): CountMinEstimate =
      copy(left = newLeft, right = newRight)
  }

  case class DeflateRatio(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, _ == StringType, "string")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "deflate_ratio"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.deflateRatio(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.deflateRatio($c)")
    override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
      copy(child = newChild)
  }

  case class AlphaTokenCount(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, _ == StringType, "string")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "alpha_token_count"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.alphaTokenCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.alphaTokenCount($c)")
    override protected def withNewChildInternal(newChild: Expression): AlphaTokenCount =
      copy(child = newChild)
  }

  case class AsciiRunCount(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child, _ == StringType, "string")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "ascii_run_count"
    override protected def nullSafeEval(input: Any): Any =
      Kernels.asciiRunCount(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.asciiRunCount($c)")
    override protected def withNewChildInternal(newChild: Expression): AsciiRunCount =
      copy(child = newChild)
  }

  def tokenSetCountCol(text: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenSetCount(ColumnBridge.expression(text), words))

  def asciiRunCountCol(text: Column): Column =
    ColumnBridge.column(AsciiRunCount(ColumnBridge.expression(text)))

  def alphaTokenCountCol(text: Column): Column =
    ColumnBridge.column(AlphaTokenCount(ColumnBridge.expression(text)))

  def deflateRatioCol(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))

  def bloomContainsAnyCol(shingles: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomContainsAny(ColumnBridge.expression(shingles), bloomBytes))

  def countMinEstimateCol(sketch: Column, item: Column): Column =
    ColumnBridge.column(CountMinEstimate(ColumnBridge.expression(sketch),
      ColumnBridge.expression(item)))

  def repetitionCol(tokens: Column, n: Int): Column =
    ColumnBridge.column(NgramRepetition(ColumnBridge.expression(tokens), n))
}
