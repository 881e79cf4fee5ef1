package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkTestBase {

  private lazy val testImplicits = spark.implicits
  import testImplicits._

  private def fixture = Seq(
    (1L, Some("alpha"), "x"),
    (2L, Some("beta"), "x"),
    (3L, None, "y"),
    (4L, Some("alpha"), "y"),
    (5L, Some("gamma"), "x")
  ).toDF("id", "name", "tag")

  test("table profiles counts, distincts, min/max and key detection") {
    val p = Profile.table(fixture, Seq("id", "name", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap

    val id = p("id")
    assert(id.getString(1) == "bigint", "data_type is the Spark type")
    assert(id.getLong(2) == 5L && id.getLong(3) == 5L && id.getLong(4) == 5L)
    assert(id.getString(5) == "1" && id.getString(6) == "5")
    assert(id.getBoolean(8), "id is null-free and all-distinct => key")

    val name = p("name")
    assert(name.getString(1) == "string")
    assert(name.getLong(3) == 4L, "one null name")
    assert(name.getLong(4) == 3L, "distinct ignores nulls")
    assert(name.getString(5) == "alpha" && name.getString(6) == "gamma")
    assert(!name.getBoolean(8), "nullable column is not a candidate key")
    // avg rendered length over NON-NULL rows: (5+4+5+5)/4
    assert(math.abs(name.getDouble(7) - 19.0 / 4) < 1e-12)

    val tag = p("tag")
    assert(tag.getLong(3) == 5L && tag.getLong(4) == 2L)
    assert(!tag.getBoolean(8), "non-distinct column is not a key")
  }

  test("table approx mode keeps the same shape without Expand") {
    val p = Profile.table(fixture, Seq("id", "tag"), exactDistinct = false)
    val rows = p.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // HLL++ at default precision is exact at these cardinalities
    assert(rows("id") == 5L && rows("tag") == 2L)
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx profile must not Expand:\n$plan")
  }

  test("topValues ranks by frequency with deterministic tie-break") {
    val tv = Profile.topValues(fixture, Seq("name", "tag"), 2)
      .collect().groupBy(_.getString(0))
    // name: alpha x2 then (beta, gamma) tie -> beta by value asc
    assert(tv("name").sortBy(_.getInt(3)).map(r =>
      (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("alpha", 2L), ("beta", 1L)))
    assert(tv("tag").sortBy(_.getInt(3)).map(r =>
      (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("x", 3L), ("y", 2L)))
  }

  test("topValues plans a partial top-k, not a global sort") {
    val tv = Profile.topValues(fixture, Seq("tag"), 1)
    val plan = tv.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("functionalDependencies separates held from violated") {
    // id -> tag holds (ids unique); tag -> name violated (tag x maps
    // to alpha/beta/gamma); name -> tag holds on non-null names here
    // (alpha appears twice, both tagged differently => violated!)
    val fds = Profile.functionalDependencies(fixture, Seq(
      "id" -> "tag", "tag" -> "name", "name" -> "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(fds("id->tag") == (5L, 0L, true))
    assert(fds("tag->name")._3 == false)
    // "alpha" rows carry tags x and y => one violating group
    assert(fds("name->tag") == (4L, 1L, false))
  }

  test("functionalDependencies ignores null dependents") {
    val df = Seq(("a", Some(1)), ("a", None), ("b", None))
      .toDF("k", "v")
    val r = Profile.functionalDependencies(df, Seq("k" -> "v")).collect()(0)
    // group a has 1 distinct non-null v; group b has 0 => no violation
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getBoolean(3))
  }

  test("drift classifies added/removed/common and type changes") {
    val oldDf = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, null, 3.0))
      .toDF("id", "name", "gone")
    val newDf = Seq((1L, 1, "x"), (2L, 2, "y"), (3L, 3, "z"))
      .toDF("id", "name", "fresh")
    val d = Profile.drift(oldDf, newDf,
        Seq("id", "name", "gone"), Seq("id", "name", "fresh"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("id").getString(1) == "common" && !d("id").getBoolean(4))
    // name changed string -> int
    assert(d("name").getString(1) == "common" && d("name").getBoolean(4))
    assert(d("name").getString(2) == "string" && d("name").getString(3) == "int")
    // old side saw a null name; new side is full
    assert(d("name").getLong(5) == 2L && d("name").getLong(6) == 3L)
    assert(d("gone").getString(1) == "removed" && d("gone").isNullAt(3) &&
      d("gone").isNullAt(4) && d("gone").isNullAt(6))
    assert(d("fresh").getString(1) == "added" && d("fresh").isNullAt(2) &&
      d("fresh").isNullAt(5) && d("fresh").getLong(6) == 3L)
  }

  test("equiDepthHistogram buckets evenly and bounds correctly") {
    val df = (1 to 800).map(i => Tuple1(i.toLong)).toDF("v")
    val h = Profile.equiDepthHistogram(df, "v", 8)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(h.keySet == (0 to 7).toSet)
    // 800 uniform values over 8 buckets: ~100 each (interpolated cut
    // points land between integers, so splits are exact)
    assert(h.values.map(_._3).sum == 800L)
    assert(h.values.forall(v => v._3 >= 99 && v._3 <= 101), h.toString)
    assert(h(0)._1 == 1.0 && h(7)._2 == 800.0, "edge bounds are min/max")
    // interior bounds chain: bucket b's hi == bucket b+1's lo
    (0 to 6).foreach(b => assert(h(b)._2 == h(b + 1)._1, s"chain at $b"))
  }

  test("equiDepthHistogram sends ties to the lower bucket") {
    // 90% of mass on one value: the tied value's bucket absorbs it
    val df = (Seq.fill(90)(5L) ++ Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L, 11L))
      .map(Tuple1(_)).toDF("v")
    val h = Profile.equiDepthHistogram(df, "v", 4)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    // all interior quantiles equal 5 => every 5 lands in bucket 0
    assert(h(0) >= 90L, h.toString)
  }

  test("stabilityCounts pins boundaries on the reference side") {
    val ref = (1 to 400).map(Tuple1(_)).toDF("v")
    val same = (1 to 400).map(Tuple1(_)).toDF("v")
    val stable = Profile.stabilityCounts(ref, same, "v", 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical distribution: every bucket matches ref exactly
    assert(stable.values.forall { case (a, b) => a == b })
    assert(stable.values.map(_._1).sum == 400L)
    // shifted distribution: all new mass above the ref maximum lands
    // in the TOP reference bucket — the classic PSI alarm shape
    val shifted = (401 to 800).map(Tuple1(_)).toDF("v")
    val alarm = Profile.stabilityCounts(ref, shifted, "v", 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(alarm(3)._2 == 400L, alarm.toString)
    assert((0 to 2).forall(b => alarm(b)._2 == 0L))
    assert((0 to 3).forall(b => alarm(b)._1 == stable(b)._1),
      "ref side must not move")
  }

  test("nulls-only column profiles cleanly") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "v")
    val r = Profile.table(df, Seq("v")).collect()(0)
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
    assert(!r.getBoolean(8))
  }
}
