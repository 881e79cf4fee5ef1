package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the most recent
  * right row with `rightTs <= leftTs` and equal key (LEFT OUTER flavor —
  * left rows with no prior right row keep a null payload).
  *
  * Spark-first composition (guide preference (a)): tag both sides, union,
  * ONE shuffle on the key, and a running `last(payload, ignoreNulls)`
  * over (ts, side) ordering — right rows sort before left rows at equal
  * ts, so a same-instant right row is visible. No range-join candidate
  * explosion, no custom SparkPlan needed: wall cost is one exchange +
  * one sort, the same as a sort-merge join.
  *
  * Ties on the right side (several right rows at the same (key, ts))
  * should be deduplicated by the caller (e.g. keep max payload) — the
  * running-last picks the physically later one otherwise.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, leftKey: Column, leftTs: Column,
               right: DataFrame, rightKey: Column, rightTs: Column,
               payload: Seq[(String, Column)]): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val payloadStruct = struct(payload.map { case (n, c) => c.as(n) }: _*)

    val r = right.select(rightKey.as("__k"), rightTs.as("__ts"),
      lit(0).as("__side"), payloadStruct.as("__payload"))
    val leftType = left.select(leftStruct.as("__left")).schema("__left").dataType
    val payloadType = r.schema("__payload").dataType

    val l = left.select(leftKey.as("__k"), leftTs.as("__ts"),
      lit(1).as("__side"), leftStruct.as("__left"),
      lit(null).cast(payloadType).as("__payload"))
    val rFull = r.select(col("__k"), col("__ts"), col("__side"),
      lit(null).cast(leftType).as("__left"), col("__payload"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(rFull)
      .withColumn("__pv", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__left.*") +: payload.map { case (n, _) => col(s"__pv.$n").as(n) }: _*)
  }
}
