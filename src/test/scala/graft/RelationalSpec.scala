package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions on the relational queries against real testdata:
  * pushdown, pruning and broadcast choices must actually appear in the
  * physical plan — the 100 TB design contract, checked at sf0.001.
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark._
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val q = df.queryExecution
    q.executedPlan.toString() + "\n" + q.explainString(org.apache.spark.sql.execution.SimpleMode)
  }

  test("filter_pushdown: predicates and projection reach the parquet scan") {
    val p = plan(RelationalQueries.filterPushdown(spark, sf))
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    // column pruning: unneeded wide columns are not read
    assert(!p.contains("l_returnflag"), "scan reads pruned column")
  }

  test("q5_multijoin: dimension joins are broadcast") {
    val p = plan(RelationalQueries.q5MultiJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q1_agg: partial (map-side) aggregation present") {
    val p = plan(RelationalQueries.q1Agg(spark, sf))
    // hash agg appears twice: partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg in:\n$p")
  }

  test("wordcount ext stays in whole-stage codegen") {
    val d = LaraQueries.extWordcount(spark, sf)
    d.collect() // finalize the AQE plan; codegen spans only appear then
    val p = d.queryExecution.executedPlan.toString()
    // codegen stages print as "*(n) Operator" in the simple plan string
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, s"no codegen span in:\n$p")
  }

  test("queries and oracles are consistently keyed") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "oracle without query: " + (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet))
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("portable windowed covariance ≈ the double-based batch twin (quantization only)") {
    // the contract query quantizes values to cents; its covariances must
    // track the unquantized operator within the quantization's effect on
    // the deviations (|Δmean| ≤ 0.005 ⇒ |Δcov| well under 1.0 here —
    // observed covariances are O(100))
    val p = RelationalQueries.windowedCovariancePortable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    val b = RelationalQueries.windowedCovarianceBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    assert(p.nonEmpty && p.keySet == b.keySet)
    p.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) <= 1.0, s"$k: portable $v vs batch ${b(k)}") }
  }
}
