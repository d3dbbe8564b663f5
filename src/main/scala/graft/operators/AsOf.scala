package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — the feature-store primitive Spark lacks
  * natively: for each left row, attach the latest right row whose time is
  * ≤ the left row's time, within the same key group.
  *
  * Plan shape (the scalable composition, not a per-row range probe): tag
  * and union both inputs, one shuffle on the join keys, and a carry-forward
  * window (`last(_, ignoreNulls)`) ordered by (time, side) — right rows
  * sort before left rows at equal time, so a right row at exactly the left
  * row's time is visible to it (DuckDB `ASOF JOIN` tie semantics). Left
  * rows with no prior right row keep nulls (left-join semantics).
  *
  * At 100 TB this is one hash shuffle + one within-partition sort — the
  * same cost as a plain sort-merge join on the keys, with AQE free to
  * handle skewed keys. A naive theta-join (`l.t >= r.t`) would be a
  * per-key cartesian.
  *
  * Right rows that tie on (keys, time) are ordered by `rightOrder` (e.g. an
  * id column) and the last one wins — pass it for determinism when such
  * ties can occur.
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightVals: Seq[String], rightOrder: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asOfJoin: at least one key column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightVals.contains),
      s"asOfJoin: right value columns $rightVals collide with left columns")

    val rStruct = struct((rightVals ++ rightOrder).distinct.map(col): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"), lit(null).cast(
          right.select(rStruct).schema.head.dataType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(l.schema("__l").dataType).as("__l"), rStruct.as("__r")): _*)

    val order: Seq[Column] = (col("__t") +: col("__side") +:
      rightOrder.map(c => col("__r").getField(c))).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      rightVals.map(c => col("__carried").getField(c).as(c))
    carried.select(out: _*)
  }
}
