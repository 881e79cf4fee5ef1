package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExplodesSpec extends SparkTestBase {

  private def df = readJson(jsonFixture(Seq(
    """{"k1": 1, "k2": "a", "arr": [{"v": 10}, {"v": 20}]}""",
    """{"k1": 2, "k2": "b", "arr": [{"v": 30}]}"""), "expl"))

  test("explodeCarry keeps parent keys on every child row (P3+G1)") {
    val out = Explodes.explodeCarry(df, Seq("k1", "k2"), col("arr"), "e")
    assert(out.columns.toSeq == Seq("k1", "k2", "e"))
    val rows = out.select(col("k1"), col("e.v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 10L), (1L, 20L), (2L, 30L)))
  }

  test("posExplodeCarry adds the 0-based element index") {
    val out = Explodes.posExplodeCarry(df, Seq("k1"), col("arr"), "idx", "e")
    val rows = out.select(col("k1"), col("idx"), col("e.v")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 0, 10L), (1L, 1, 20L), (2L, 0, 30L)))
  }

  test("explodeMapWrapped yields (label, element) rows (G2)") {
    val out = Explodes.explodeMapWrapped(df, "items", col("arr"))
    assert(out.columns.toSeq == Seq("key", "value"))
    val rows = out.select(col("key"), col("value.v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("items", 10L), ("items", 20L), ("items", 30L)))
  }
}
