package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Frontend compile+execute test mirroring the reference's netflow flow
  * (`opt/QueryOptimizeExecuteTest.kt:38-119`): CSV scan with declared
  * scheme → Apply computed column RATE = TotBytes/Dur/1000.0 →
  * Select TotBytes > N → FileStore → read back.
  */
class RelationalFrontendSpec extends AnyFunSuite {
  import TestSpark._
  import Relational._

  private val scheme = new StructType()
    .add("StartTime", StringType).add("Dur", DoubleType).add("Proto", StringType)
    .add("SrcAddr", StringType).add("TotPkts", LongType).add("TotBytes", LongType)

  private def netflowCsv(): String = {
    val dir = java.nio.file.Files.createTempDirectory("netflow")
    java.nio.file.Files.write(dir.resolve("flows.csv"), Seq(
      "2011-08-10 09:46:53,3550.18,udp,147.32.84.229,12,875",
      "2011-08-10 09:46:53,0.37,tcp,147.32.84.59,4,249",
      "2011-08-10 09:47:05,1.42,tcp,147.32.84.229,8,4800",
      // Note: malformed detection applies to the columns a query actually
      // reads (column pruning reaches the CSV parser), and short rows are
      // null-filled rather than malformed — only a parse *error* in a
      // projected column drops the row.
      "g1,g2,g3,g4,notanint,g6").mkString("\n").getBytes)
    dir.toString
  }

  test("netflow: FileScan → Apply(RATE) → Select → Dump") {
    val q = Dump(
      Select(Gt(Ref("TotBytes"), Lit(500L)),
        Apply(Seq(
          "SrcAddr" -> Ref("SrcAddr"),
          "TotBytes" -> Ref("TotBytes"),
          "RATE" -> Divide(Divide(Ref("TotBytes"), Ref("Dur")), Lit(1000.0))),
          FileScan(netflowCsv(), scheme))))
    val rows = lower(spark, q).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("147.32.84.229", 875L), ("147.32.84.229", 4800L)))
  }

  test("netflow: FileStore sink writes and returns rows") {
    val out = java.nio.file.Files.createTempDirectory("netflow_out").toString + "/t"
    // full-schema projection: malformed-drop engages only when the scan
    // reads every declared column (see Sources caveats)
    val q = FileStore(out, header = true,
      Apply(scheme.fieldNames.toSeq.map(f => f -> (Ref(f): Expr)),
        FileScan(netflowCsv(), scheme)))
    // the write itself parses the full schema → malformed row dropped;
    // (a projection-free count() on the returned frame would parse nothing
    // and see 4 — the CSV caveat in Sources)
    assert(lower(spark, q).columns.toSeq == scheme.fieldNames.toSeq)
    assert(spark.read.option("header", true).csv(out).count() == 3)
  }

  test("expression AST covers arithmetic, comparison, boolean ops") {
    val d = df(new StructType().add("a", IntegerType).add("b", IntegerType),
      Seq(Row(1, 2), Row(5, 2), Row(3, 3)))
    d.createOrReplaceTempView("ab")
    val q = Select(
      And(Or(Gt(Ref("a"), Ref("b")), Eq(Ref("a"), Ref("b"))), Not(Lt(Ref("a"), Lit(2)))),
      Apply(Seq("a" -> Ref("a"), "b" -> Ref("b"),
        "s" -> Plus(Ref("a"), Times(Ref("b"), Lit(10)))), Scan("ab")))
    assert(rowSet(lower(spark, q)) == Set(Seq[Any](5, 2, 25), Seq[Any](3, 3, 33)))
  }
}
