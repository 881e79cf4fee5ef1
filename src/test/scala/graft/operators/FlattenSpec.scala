package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** P1 semantics (reference zoom_proc.py:95-104) incl. the quirks SURVEY
  * §7.4.1 calls out: column order, prefix-applied-to-every-struct, the
  * Python-falsy empty prefix, and one-level-per-call.
  */
class FlattenSpec extends SparkTestBase {

  private def df = readJson(jsonFixture(Seq(
    """{"plain": 1, "a": {"x": 10, "y": "s"}, "b": {"x": 20}}"""), "flat"))

  test("default aliasing is structCol_field, flat columns first") {
    val out = Flatten.flatten(df)
    assert(out.columns.toSeq == Seq("plain", "a_x", "a_y", "b_x"))
    val r = out.head()
    assert(r.getAs[Long]("a_x") == 10L && r.getAs[Long]("b_x") == 20L)
  }

  test("explicit prefix applies to the fields of EVERY struct column") {
    // the provenance-losing quirk (monkey_proc.py:305-315 relies on it)
    val out = Flatten.flatten(
      df.select(col("plain"), col("a"), struct(col("b.x").as("z")).as("c")),
      Some("p_"))
    assert(out.columns.toSeq == Seq("plain", "p_x", "p_y", "p_z"))
  }

  test("empty prefix is Python-falsy: behaves like no prefix") {
    // vk_proc.py:129 calls flat_df(sdf, prefix='') and still gets city_id
    val out = Flatten.flatten(df, Some(""))
    assert(out.columns.toSeq == Seq("plain", "a_x", "a_y", "b_x"))
  }

  test("one level per call: nested structs need repeated calls") {
    val nested = readJson(jsonFixture(Seq(
      """{"k": 1, "o": {"inner": {"v": 5}, "w": 2}}"""), "nested"))
    val once = Flatten.flatten(nested)
    assert(once.columns.toSeq == Seq("k", "o_inner", "o_w"))
    assert(once.schema("o_inner").dataType.typeName == "struct")
    val twice = Flatten.flatten(once)
    assert(twice.columns.toSeq == Seq("k", "o_w", "o_inner_v"))
  }

  test("flattenAll recurses to any depth with path names") {
    val nested = readJson(jsonFixture(Seq(
      """{"k": 1, "o": {"inner": {"v": 5}, "w": 2}}"""), "deep"))
    val out = Flatten.flattenAll(nested)
    assert(out.columns.toSeq == Seq("k", "o_inner_v", "o_w"))
    assert(out.head().getAs[Long]("o_inner_v") == 5L)
  }

  test("column names with dots and backticks survive flattening") {
    val tricky = spark.range(1).select(lit(7).as("weird.name"),
      struct(lit(8).as("f")).as("s"))
    val out = Flatten.flatten(tricky)
    assert(out.columns.toSeq == Seq("weird.name", "s_f"))
  }
}
