package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bloom-prefiltered decontamination: exactness (the sketch is a
  * pre-filter, never the decision), false-positive resolution under a
  * deliberately bad sketch, degenerate inputs, and the plan property the
  * operator exists for — the might_contain filter sits on the training
  * scan side, below the exact join's exchange.
  */
class BloomDecontaminateSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = new StructType().add("doc_id", LongType).add("text", StringType)
  private def docs(rows: (Long, String)*) =
    df(docSchema, rows.map(r => Row(r._1, r._2)))

  // 12-token docs: > k=5 so real shingle windows form
  private def para(seed: String) = (1 to 12).map(i => s"$seed$i").mkString(" ")

  private val evalSet = docs(100L -> para("ev"), 101L -> para("eq"))
  private val train = docs(
    1L -> para("tok"),                                      // clean
    2L -> (para("ev").split(" ").take(6).mkString(" ") + " tail1 tail2 tail3 tail4 tail5 tail6"), // shares ev1..ev5 shingle
    3L -> para("other"),                                    // clean
    4L -> para("eq"))                                       // fully contaminated

  test("clean = exact anti-join semantics (bloom invisible in the result)") {
    val r = Dedup.bloomDecontaminate(train, evalSet)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(r == Set(1L, 3L))
  }

  test("a saturated sketch (fpp→1) still yields the exact result") {
    // 64-bit minimum sketch over 2×8 shingles ≈ every probe positive: the
    // exact semi-join must drain all the false positives
    val r = Dedup.bloomDecontaminate(train, evalSet, fpp = 0.99, maxBits = 64L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(r == Set(1L, 3L))
  }

  test("empty eval set passes the whole training corpus through") {
    val r = Dedup.bloomDecontaminate(train, evalSet.filter(col("doc_id") < 0))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(r == Set(1L, 2L, 3L, 4L))
  }

  test("empty training corpus yields an empty clean corpus") {
    assert(Dedup.bloomDecontaminate(train.filter(col("doc_id") < 0), evalSet).count() == 0L)
  }

  test("output preserves the full input schema and row content") {
    val wide = train.withColumn("source", concat(lit("s"), col("doc_id")))
    val r = Dedup.bloomDecontaminate(wide, evalSet)
    assert(r.schema.fieldNames.toSeq == Seq("doc_id", "text", "source"))
    assert(r.select(col("source")).collect().map(_.getString(0)).toSet == Set("s1", "s3"))
  }

  test("plan: might_contain screens the training side below the exact join") {
    val plan = Dedup.bloomDecontaminate(train, evalSet).queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from the optimized plan:\n$plan")
  }
}
