package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.Similarity

/** Native fused cosine expression vs the HOF reference formulation:
  * differential on random vectors, null/zero semantics, codegen execution.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  import TestSpark._

  private val schema = new StructType()
    .add("a", ArrayType(FloatType)).add("b", ArrayType(FloatType))

  test("matches the HOF formulation on random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)(Row(
      Seq.fill(16)(rnd.nextFloat() * 2 - 1), Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val d = df(schema, rows)
    val diff = d.select(
      abs(Similarity.cosine(col("a"), col("b")) -
          Similarity.cosineHof(col("a"), col("b"))).as("d"))
      .agg(max(col("d"))).collect().head.getDouble(0)
    // HOF multiplies in float precision (float*float→float) before widening;
    // the native loop widens first — so they agree only to ~float epsilon.
    assert(diff < 1e-6, s"native vs HOF max diff $diff")
  }

  test("null input → null; zero vector → 0.0; identical → 1.0") {
    val d = df(schema, Seq(
      Row(null, Seq(1.0f, 2.0f)),
      Row(Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      Row(Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))))
    val r = d.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getDouble(0) == 0.0)
    assert(math.abs(r(2).getDouble(0) - 1.0) < 1e-12)
  }

  test("executes inside whole-stage codegen") {
    val d = df(schema, Seq(Row(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))))
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    d.collect()
    val p = d.queryExecution.executedPlan.toString()
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, s"fell out of codegen:\n$p")
  }

  test("length mismatch fails loudly") {
    val d = df(schema, Seq(Row(Seq(1.0f), Seq(1.0f, 2.0f))))
    val e = intercept[Exception](d.select(Similarity.cosine(col("a"), col("b"))).collect())
    assert(e.getMessage != null)
  }
}
