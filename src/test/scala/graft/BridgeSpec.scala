package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused eager-checkpoint+count bridge
  * (org.apache.spark.sql.graft.bridge.localCheckpointCounted) that the
  * iterative operators' convergence probes ride on (r13): the returned
  * frame must be row-identical to the input plan, reusable across
  * multiple downstream actions (it IS a materialized checkpoint), and the
  * count must be the row count (no predicate) or the predicate count.
  */
class BridgeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import org.apache.spark.sql.graft.bridge

  test("localCheckpointCounted returns the materialization row count") {
    val df = spark.range(0L, 1000L, 1L, 4).selectExpr("id", "id % 7 as m")
    val (out, n) = bridge.localCheckpointCounted(df)
    assert(n === 1000L)
    assert(out.schema === df.schema)
    // the checkpoint is consumable repeatedly and row-identical
    assert(out.count() === 1000L)
    assert(TestSpark.rowSet(out) === TestSpark.rowSet(df))
  }

  test("localCheckpointCounted counts a per-row predicate instead") {
    val df = spark.range(0L, 100L, 1L, 3)
      .selectExpr("id", "id < 10 as small")
    val (out, n) = bridge.localCheckpointCounted(df, r => r.getBoolean(1))
    assert(n === 10L)
    assert(out.count() === 100L) // predicate never filters the data
    assert(TestSpark.rowSet(out) === TestSpark.rowSet(df))
  }

  test("localCheckpointCounted of an empty frame counts zero") {
    val df = spark.range(0L, 50L, 1L, 2).filter(col("id") < 0L).toDF()
    val (out, n) = bridge.localCheckpointCounted(df)
    assert(n === 0L)
    assert(out.count() === 0L)
  }

  test("checkpointed frame joins and aggregates like the original") {
    // the iterative loops feed the result straight into next-round joins:
    // partitioning/ordering metadata from LogicalRDD.fromDataset must not
    // change results
    val a = spark.range(0L, 200L, 1L, 4).selectExpr("id as v", "id % 3 as d")
      .repartition(col("v"))
    val (ck, n) = bridge.localCheckpointCounted(a)
    assert(n === 200L)
    val b = spark.range(0L, 200L, 2L, 2).selectExpr("id as v")
    val joined = ck.join(b, Seq("v")).groupBy(col("d")).count()
    val expect = a.join(b, Seq("v")).groupBy(col("d")).count()
    assert(TestSpark.rowSet(joined) === TestSpark.rowSet(expect))
  }
}
