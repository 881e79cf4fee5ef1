package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ConstraintsSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._
  import Constraints._

  private def rows = Seq[(java.lang.Long, java.lang.Long, String)](
    (1L, 10L, "A"), (2L, 20L, "B"), (2L, 99L, "A"), // dup key 2; 99 + B off-domain
    (3L, null, "A"),                                // null value
    (null, 30L, "A")                                // null key
  ).toDF("k", "v", "flag")

  test("audit: SQL-CHECK null semantics, unique counts ROWS, FK passes nulls") {
    val dim = Seq(1L, 2L, 3L).toDF("dk") // FK target misses nothing non-null... except nothing: all non-null k in {1,2,3}
    val got = Constraints.audit(rows, Seq(
        NotNull("k"), NotNull("v"),
        InRange("v", 10L, 50L),     // 99 violates; NULL v passes (CHECK)
        Matches("flag", "^A$"),     // one B violates
        Unique(Seq("k")),           // key 2 twice -> 2 violating ROWS
        ForeignKey("k", dim, "dk")  // null k passes; 1,2,3 present
      )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("not_null(k)") == (5L, 1L))
    assert(got("not_null(v)") == (5L, 1L))
    assert(got("in_range(v,10,50)") == (5L, 1L)) // null v is NOT a violation
    assert(got("matches(flag)") == (5L, 1L))
    assert(got("unique(k)") == (5L, 2L))
    assert(got("foreign_key(k->dk)") == (5L, 0L))
  }

  test("audit: FK violations count only non-null misses; gated audit fails in-plan") {
    val dim = Seq(1L, 3L).toDF("dk") // key 2 (twice) now dangles
    val got = Constraints.audit(rows, Seq(ForeignKey("k", dim, "dk")))
      .collect().head
    assert((got.getLong(1), got.getLong(2)) == (5L, 2L))
    // the gate: clean rule reads fine, violated rule fails the job
    assert(Constraints.auditGated(rows, Seq(NotNull("flag"))).count() == 1)
    val e = intercept[Exception] {
      Constraints.auditGated(rows, Seq(NotNull("k"))).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("data-quality constraint violated")))
  }

  test("rejects an empty rule set and an empty Unique key") {
    intercept[IllegalArgumentException] {
      Constraints.audit(rows, Nil)
    }
    intercept[IllegalArgumentException] { Unique(Nil) }
  }

  test("profile-suggested rules re-audit the SAME table green and flag " +
    "every injected violation on a drifted load") {
    import graft.TestSpark.spark.implicits._
    val base = (1 to 50).map(i => (i.toLong, s"u$i", (i % 9) + 10L))
      .toDF("id", "name", "qty")
    val profile = Profile.table(base, Seq("id", "name", "qty"))
    val suggested = Constraints.suggestFromProfile(profile)
    val byType = suggested.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // id: null-free unique integral -> all three rules; name: unique
    // string (no range — the lossless-cast gate); qty: duplicated
    // values (no unique)
    assert(byType == Set(
      ("id", "not_null"), ("id", "unique"), ("id", "in_range"),
      ("name", "not_null"), ("name", "unique"),
      ("qty", "not_null"), ("qty", "in_range")), byType.toString)
    val rules = Constraints.fromSuggestions(suggested)
    assert(rules.size == 7)
    // same table: every suggested rule audits clean
    val self = Constraints.audit(base, rules).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(self.values.forall(_ == 0L), self.toString)
    // drifted load: a null name, a duplicate id and an out-of-range
    // qty must each be flagged by its OWN rule
    val drifted = base.unionByName(Seq(
      (1L, null.asInstanceOf[String], 99L)).toDF("id", "name", "qty"))
    val flagged = Constraints.audit(drifted, rules).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(flagged("not_null(name)") == 1L, flagged.toString)
    assert(flagged("unique(id)") == 2L, flagged.toString) // both dup rows
    assert(flagged("in_range(qty,10,18)") == 1L, flagged.toString)
    assert(flagged("not_null(id)") == 0L && flagged("not_null(qty)") == 0L)
  }

  test("a string column whose values RENDER as integers gets no range " +
    "rule — the gate is the column type, not the rendering") {
    import graft.TestSpark.spark.implicits._
    // zero-padded numeric codes: min/max render as castable integers,
    // but the column's domain is lexicographic — a numeric range rule
    // would be wrong (and auditing it compares strings to longs)
    val codes = Seq("0001", "0002", "0042").toDF("code")
    val suggested = Constraints.suggestFromProfile(
      Profile.table(codes, Seq("code")))
    val types = suggested.collect().map(_.getString(1)).toSet
    assert(types == Set("not_null", "unique"), types.toString)
  }

  test("InRange on a type-drifted string column counts non-numeric " +
    "values as violations instead of failing under ANSI") {
    import graft.TestSpark.spark.implicits._
    // the rule was suggested against yesterday's integral column;
    // today's load drifted the type to string with stray values
    val drifted = Seq("3", "7.0", "10.5", "oops", null).toDF("qty")
    val got = Constraints.audit(drifted, Seq(InRange("qty", 1L, 10L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // "3" and "7.0" parse as NUMBERS in range (a long-only parse would
    // wrongly flag the fractional rendering); "10.5" parses but is out
    // of range; "oops" is definitely not in [1,10]; the null passes
    // (unknown) per the SQL CHECK semantics
    assert(got("in_range(qty,1,10)") == (5L, 2L), got.toString)
  }
}
