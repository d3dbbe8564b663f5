package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.execution.{LogicalRDD, SQLExecution}

/** Bridge into `private[sql]` surface: Column ↔ Expression conversion for
  * custom Catalyst expressions, and an eager local checkpoint fused with
  * its materialization count. Namespaced under org.apache.spark.sql by
  * necessity (the standard pattern for Spark extension libraries);
  * contains no query logic.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager local checkpoint that RETURNS the count of the materialization
    * job. `Dataset.localCheckpoint(eager = true)` already materializes the
    * checkpoint by running `rdd.count()` and THROWS THE RESULT AWAY, so an
    * iterative operator that needs its per-round row count (a convergence
    * probe: kCore/kTruss survivor counts, a frontier's isEmpty) pays a
    * SECOND driver-synchronized job per round on top of the checkpoint
    * job. This mirrors the Dataset.checkpoint internals — same
    * `executedPlan.execute().map(_.copy())`, same `localCheckpoint()`,
    * same `LogicalRDD.fromDataset` result (output partitioning/ordering
    * preserved, lineage cut) — but surfaces the count, halving the
    * driver round-trips of every fixed-point loop.
    *
    * `pred`: optional per-row predicate evaluated DURING the
    * materialization pass and counted via an accumulator; the second
    * element of the result is its count (or the row count when `pred` is
    * null). Accumulator counts from re-run tasks can double-count ON
    * RETRY, which can only inflate a nonzero count, never turn zero
    * nonzero or nonzero zero (rows either exist or don't) — callers use
    * it strictly for zero/progress convergence tests, NEVER as a result
    * value (the hopPlot per-round histogram count stays a real aggregate
    * for exactly this reason).
    */
  def localCheckpointCounted(df: DataFrame,
                             pred: InternalRow => Boolean = null): (DataFrame, Long) = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    SQLExecution.withNewExecutionId(qe, Some("graftLocalCheckpointCounted")) {
      val acc =
        if (pred == null) null
        else spark.sparkContext.longAccumulator("graft.checkpointPredCount")
      val base = qe.executedPlan.execute()
      val rdd =
        if (acc == null) base.map(_.copy())
        else base.map { r => if (pred(r)) acc.add(1L); r.copy() }
      rdd.localCheckpoint()
      val total = rdd.count() // ONE job: materializes the checkpoint AND counts
      val out = Dataset.ofRows(spark,
        LogicalRDD.fromDataset(rdd, ds, isStreaming = false).newInstance())
      (out, if (acc == null) total else acc.value)
    }
  }
}
