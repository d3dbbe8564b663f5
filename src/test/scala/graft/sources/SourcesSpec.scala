package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CSV source/sink semantics (reference `CSVScan`/`FileStoreIterator`,
  * `opt/Operators.kt:26-155,372-477`): malformed-row dropping, bad-row
  * accounting, header round-trip.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = new StructType()
    .add("name", StringType).add("n", IntegerType).add("x", DoubleType)

  private def writeTemp(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("csv_src")
    java.nio.file.Files.write(dir.resolve("part.csv"),
      String.join("\n", lines: _*).getBytes)
    dir.toString
  }

  test("csv drops malformed rows (DROPMALFORMED)") {
    val p = writeTemp(Seq("a,1,1.5", "bad,notint,zz", "b,2,2.5"))
    val d = Sources.csv(spark, p, schema)
    assert(rowSet(d) == Set(Seq[Any]("a", 1, 1.5), Seq[Any]("b", 2, 2.5)))
  }

  test("csvWithBadRows splits good rows from bad raw lines with counts") {
    val p = writeTemp(Seq("a,1,1.5", "bad,notint,zz", "b,2,2.5", "c,3"))
    val (good, bad) = Sources.csvWithBadRows(spark, p, schema)
    // "bad,notint,zz" (type error) and "c,3" (missing column) are both
    // flagged corrupt; permissive mode keeps nothing from them here
    assert(good.count() == 2)
    assert(bad.count() == 2)
  }

  test("csv sink with header round-trips") {
    val p = writeTemp(Seq("a,1,1.5"))
    val d = Sources.csv(spark, p, schema)
    val out = java.nio.file.Files.createTempDirectory("csv_out").toString + "/t"
    Sources.writeCsv(d, out, header = true)
    val back = spark.read.schema(schema).option("header", true).csv(out)
    assert(rowSet(back) == rowSet(d))
  }
}
