package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Array-to-rows generators with key carry — how the reference encodes
  * parent/child relations WITHOUT joins (reference zoom_proc.py:154-158,
  * monkey_proc.py:294-314, vk_proc.py:142-202): parent key columns are
  * projected alongside the exploded array so children stay linked.
  */
object Explodes {

  /** P3 + G1: keep `keys`, explode `arrayCol` into one row per element. */
  def explodeCarry(df: DataFrame, keys: Seq[String], arrayCol: Column,
                   alias: String): DataFrame =
    df.select((keys.map(col) :+ explode(arrayCol).as(alias)): _*)

  /** Like [[explodeCarry]] but keeps the element index (0-based). */
  def posExplodeCarry(df: DataFrame, keys: Seq[String], arrayCol: Column,
                      posAlias: String, alias: String): DataFrame =
    df.select((keys.map(col) ++ Seq(posexplode(arrayCol))): _*)
      .withColumnRenamed("pos", posAlias)
      .withColumnRenamed("col", alias)

  /** G2 (reference zoom_proc.py:181-190): wrap a nested array in a
    * single-entry map literal and explode the map — yields (key, value)
    * rows where `key` is the constant label and `value` the array, which
    * is then exploded again. Semantically a labelled explode; preserved
    * because the extra `key` column affects downstream flatten order.
    */
  def explodeMapWrapped(df: DataFrame, label: String, arrayCol: Column): DataFrame =
    df.select(explode(map(lit(label), arrayCol)))
      .select(col("key"), explode(col("value")).as("value"))
}
