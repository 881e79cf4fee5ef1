package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{TextFunctions, VectorFunctions}

/** Specs for the round-5 curation operators: PII scrubbing, eval-set
  * contamination, int8 embedding quantization. The DuckDB oracles verify
  * end-to-end equality on the harness tables; these specs pin the
  * SEMANTIC contracts on adversarial fixtures the synthetic tables don't
  * contain.
  */
class CurationOpsSpec extends SparkTestBase {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  // --- scrubPii -----------------------------------------------------------

  test("scrubPii masks urls, emails and long digit runs") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "see https://a.b/c?d=1&e=2 and http://x.io",
      "call 1234567 or 123456789012",
      "clean text stays untouched"
    ).toDF("text")
    val out = df.select(TextFunctions.scrubPii(col("text")).as("s"))
      .as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "see <URL> and <URL>")
    assert(out(2) == "call <NUM> or <NUM>")
    assert(out(3) == "clean text stays untouched")
  }

  test("scrubPii: url containing email-like and digit spans masks as one URL") {
    val df = Seq("go https://h.io/u@v.com/1234567890 end").toDF("text")
    val out = df.select(TextFunctions.scrubPii(col("text")).as("s"))
      .as[String].collect()
    assert(out(0) == "go <URL> end")
  }

  test("scrubPii: short digit runs (zip codes, years) survive") {
    val df = Seq("year 2026 zip 02139").toDF("text")
    val out = df.select(TextFunctions.scrubPii(col("text")).as("s"))
      .as[String].collect()
    assert(out(0) == "year 2026 zip 02139")
  }

  // --- shingleContamination ------------------------------------------------

  private val corpus = Seq(
    (1L, "the quick brown fox jumps high"),     // shares "the quick brown", "quick brown fox"
    (2L, "totally unrelated words here now"),   // clean
    (3L, "the quick brown fox the quick brown fox") // repeated shingles count ONCE
  ).toDF("doc_id", "text")
  private val eval_ = Seq(
    (100L, "the quick brown fox")
  ).toDF("doc_id", "text")

  test("shingleContamination counts distinct shared shingles, omits clean docs") {
    val got = Dedup.shingleContamination(corpus, eval_,
        col("doc_id"), col("text"), n = 3)
      .orderBy("doc_id")
      .as[(Long, Long)].collect()
    // eval shingles: {"the quick brown", "quick brown fox"}
    assert(got === Array((1L, 2L), (3L, 2L)))
  }

  test("shingleContamination broadcast side: corpus scan has no exchange before the join") {
    val plan = Dedup.shingleContamination(corpus, eval_,
        col("doc_id"), col("text"), n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join for the eval side, got:\n$plan")
  }

  // --- quantize8 ------------------------------------------------------------

  test("quantize8 roundtrip error is bounded by scale/2 and codes stay in [-127,127]") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(1e-8f, -1e-8f, 1e-8f, 0.0f)),
      (3L, Array(3.5f, 3.5f, 3.5f, 3.5f))
    ).toDF("vec_id", "v")
    val rows = df.select(col("vec_id"),
        col("v").cast("array<double>").as("v"),
        VectorFunctions.quantize8(col("v")).as("q"),
        VectorFunctions.quantScale(col("v")).as("s"))
      .as[(Long, Seq[Double], Seq[Byte], Double)].collect()
    for ((_, v, q, s) <- rows) {
      assert(q.forall(b => b >= -127 && b <= 127))
      v.zip(q).foreach { case (x, b) =>
        assert(math.abs(x - b * s) <= s / 2 + 1e-12,
          s"dequant error for $x -> $b at scale $s")
      }
    }
  }

  test("quantize8 on the zero vector yields zero codes and ~zero scale, no failure") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "v")
    val (q, s) = df.select(VectorFunctions.quantize8(col("v")).as("q"),
        VectorFunctions.quantScale(col("v")).as("s"))
      .as[(Seq[Byte], Double)].head()
    assert(q == Seq(0.toByte, 0.toByte))
    assert(s < 1e-20)
  }

  test("quantize8 max-magnitude element maps to exactly +/-127") {
    val df = Seq((1L, Array(-2.0f, 1.0f, 2.0f))).toDF("vec_id", "v")
    val q = df.select(VectorFunctions.quantize8(col("v")).as("q"))
      .as[Seq[Byte]].head()
    assert(q.head == -127.toByte && q.last == 127.toByte)
  }
}
