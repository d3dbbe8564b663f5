package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** NFC normalization: canonical composition, idempotence, null safety,
  * and codegen/interpreted agreement. All non-ascii text is written as
  * explicit \\u escapes — raw combining characters in source are
  * editor-fragile.
  */
class TextNormalizeSpec extends AnyFunSuite {
  import TestSpark._

  private val st = new StructType().add("id", LongType).add("s", StringType)

  test("decomposed sequences compose; composed text is a fixed point; nulls pass") {
    val rows = Seq(
      Row(1L, "café"),     // e + combining acute → U+00E9
      Row(2L, "caf\u00e9"),   // already precomposed
      Row(3L, "Å"),        // A + combining ring → U+00C5
      Row(4L, "plain ascii"),
      Row(5L, null))
    val d = df(st, rows).select(col("id"), TextNormalize.nfc(col("s")).as("n"))
    val got = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "caf\u00e9" && got(1L).length == 4)
    assert(got(2L) == "caf\u00e9", "precomposed input unchanged")
    assert(got(3L) == "\u00c5" && got(3L).length == 1)
    assert(got(4L) == "plain ascii")
    assert(got(5L) == null)
    // idempotent
    val twice = df(st, rows).select(col("id"),
      TextNormalize.nfc(TextNormalize.nfc(col("s"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got)
  }

  test("codegen and interpreted eval agree") {
    val s = "röntgen ñ Å café ascii"
    val expr = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    val interpreted = expr.eval(null).toString
    assert(interpreted == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(interpreted.contains("r\u00f6ntgen"), "umlaut composed")
    // the Column path runs through whole-stage codegen in a real plan
    val viaPlan = df(st, Seq(Row(1L, s)))
      .select(TextNormalize.nfc(col("s"))).collect().head.getString(0)
    assert(viaPlan == interpreted)
  }
}
