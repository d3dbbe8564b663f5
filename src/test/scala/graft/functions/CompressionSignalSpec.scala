package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Behavior contract for the compression-ratio quality signal (no DuckDB
  * oracle exists for deflate — see CompressionKernel's scaladoc).
  */
class CompressionSignalSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = new StructType().add("doc_id", LongType).add("text", StringType)
  private def docs(rows: (Long, String)*) =
    df(schema, rows.map(r => Row(r._1, r._2)))

  private def ratios(rows: (Long, String)*): Map[Long, Double] =
    docs(rows: _*)
      .select(col("doc_id"), CompressionKernel.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("repetitive text compresses far better than high-entropy text") {
    val repetitive = "the same phrase again and again " * 40
    val entropy = (1 to 160).map(i => PortableHash.local60(s"w$i").toHexString).mkString(" ")
    // templated sentences: more varied than pure repetition, far more
    // redundant than hash soup — deflate needs ~1.5 KB to show the order
    val templated = (1 to 12).map(i => s"Sentence $i discusses a different topic " +
      "entirely, covering quality signals, dedup stages, and curation tradeoffs.")
      .mkString(" ")
    val r = ratios(1L -> repetitive, 2L -> entropy, 3L -> templated)
    assert(r(1L) < 0.1, s"boilerplate should crush: ${r(1L)}")
    assert(r(2L) > 0.5, s"hex soup should not: ${r(2L)}")
    assert(r(3L) > r(1L) && r(3L) < r(2L),
      s"templated prose sits between: ${r(1L)} < ${r(3L)} < ${r(2L)}")
  }

  test("deterministic across runs and partitionings; empty text → 1.0") {
    val rows = (1L to 50L).map(i => i -> (s"doc $i " + ("lorem ipsum " * (i % 7).toInt)))
    val a = ratios(rows: _*)
    val b = docs(rows: _*).repartition(7)
      .select(col("doc_id"), CompressionKernel.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    assert(ratios(99L -> "")(99L) == 1.0)
  }

  test("deflated length stays in whole-stage codegen") {
    val d = docs(1L -> "abc")
      .select(CompressionKernel.deflatedLength(col("text")).as("l"))
    assert(d.head().getLong(0) > 0L)
    // codegen stages print as "*(n) Operator" in the simple plan string
    val plan = d.queryExecution.executedPlan.toString()
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined, s"no codegen span in:\n$plan")
  }

  test("multi-byte UTF-8 counts bytes, not chars") {
    // 100 identical 3-byte chars: byte length 300, deflate must see bytes
    val s = "€" * 100
    val got = docs(1L -> s)
      .select(octet_length(col("text")).as("b"),
        CompressionKernel.compressionRatio(col("text")).as("r")).head()
    assert(got.getInt(0) == 300)
    assert(got.getDouble(1) < 0.2) // repetitive → compresses well
  }
}
