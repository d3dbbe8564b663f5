package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Raco plan-text parsing: PTree stage, operator lowering, and the netflow
  * fixture end-to-end (reference `opt/QueryOptimizeExecuteTest.kt:38-83`,
  * plan text from its embedded myrial compilation).
  */
class RacoParserSpec extends AnyFunSuite {
  import RacoParser._

  test("PTree: literals, strings, unicode prefix, None, tuples, lists, dicts") {
    assert(parse("42") == PLong(42))
    assert(parse("-3.5") == PDouble(-3.5))
    assert(parse("1e3") == PDouble(1000.0))
    assert(parse("'abc'") == PStr("abc"))
    assert(parse("u'abc'") == PStr("abc")) // python2 unicode repr
    assert(parse("\"d'e\"") == PStr("d'e"))
    assert(parse("None") == PNone)
    assert(parse("(1, 2)") == PTuple(List(PLong(1), PLong(2))))
    assert(parse("[1, 'a', None]") == PList(List(PLong(1), PStr("a"), PNone)))
    assert(parse("{'skip': 1}") == PMap(Map("skip" -> PLong(1))))
    assert(parse("Foo(1, Bar('x'))") ==
      PNode("Foo", List(PLong(1), PNode("Bar", List(PStr("x"))))))
    intercept[RacoParseException](parse("Foo(1) trailing"))
    intercept[RacoParseException](parse("[1, 2"))
  }

  test("expression lowering: refs, positional refs, literals, operators") {
    assert(toExpr(parse("NamedAttributeRef('dst')")) == Relational.Ref("dst"))
    assert(toExpr(parse("UnnamedAttributeRef(12, None)")) == Relational.PosRef(12))
    assert(toExpr(parse("NumericLiteral(250)")) == Relational.Lit(250L))
    assert(toExpr(parse("NumericLiteral(1000.0)")) == Relational.Lit(1000.0))
    assert(toExpr(parse("StringLiteral('tcp')")) == Relational.Lit("tcp"))
    assert(toExpr(parse("GT(DIVIDE(NamedAttributeRef('a'), NumericLiteral(2)), NumericLiteral(1))")) ==
      Relational.Gt(Relational.Divide(Relational.Ref("a"), Relational.Lit(2L)), Relational.Lit(1L)))
  }

  test("netflow fixture: Store(Apply(Select(FileScan))) plan text end-to-end") {
    val spark = TestSpark.spark
    // CSV fixture with the reference's 17-column netflow scheme + header row
    val dir = java.nio.file.Files.createTempDirectory("raco_netflow")
    val csv = dir.resolve("netflow.csv")
    val header = "StartTime,Dur,Proto,SrcAddr,Sport,Dir,DstAddr,Dport,State,sTos,dTos,TotPkts,TotBytes,SrcBytes,Label,__DAP__,__LAP__"
    val rows = Seq(
      "2011-08-10 09:46:53,3.2,tcp,147.32.84.165,1024,->,147.32.84.255,138,CON,0,0,2,500.0,250,flow1,0,0",
      "2011-08-10 09:46:54,1.6,udp,147.32.84.165,1025,->,147.32.84.191,139,CON,0,0,1,100.0,50,flow2,0,0",
      "2011-08-10 09:46:55,0.8,tcp,147.32.84.166,1026,->,147.32.84.255,445,REQ,0,0,4,1000.0,900,flow3,0,0")
    java.nio.file.Files.writeString(csv, (header +: rows).mkString("\n"))

    // Plan text as the reference myrial compiler emits it
    // (QueryOptimizeExecuteTest.kt:104-117), file path swapped for the
    // fixture; UnnamedAttributeRef(12) = TotBytes, filter TotBytes > 250.
    val plan = s"""Store(RelationKey('public','adhoc','netflow_subset'),
       Apply([('TotBytes', NamedAttributeRef('TotBytes')), ('StartTime', NamedAttributeRef('StartTime')),
       ('SrcAddr', NamedAttributeRef('SrcAddr')), ('DstAddr', NamedAttributeRef('DstAddr')),
       ('RATE', DIVIDE(DIVIDE(NamedAttributeRef('TotBytes'), NamedAttributeRef('Dur')), NumericLiteral(1000.0)))
       ],
        Select(GT(UnnamedAttributeRef(12, None), NumericLiteral(250)),
         FileScan('file://${csv}', 'CSV',
          Scheme([('StartTime', 'STRING_TYPE'), ('Dur', 'DOUBLE_TYPE'), ('Proto', 'STRING_TYPE'), ('SrcAddr', 'STRING_TYPE'), ('Sport', 'STRING_TYPE'), ('Dir', 'STRING_TYPE'), ('DstAddr', 'STRING_TYPE'), ('Dport', 'STRING_TYPE'), ('State', 'STRING_TYPE'), ('sTos', 'LONG_TYPE'), ('dTos', 'LONG_TYPE'), ('TotPkts', 'LONG_TYPE'), ('TotBytes', 'DOUBLE_TYPE'), ('SrcBytes', 'LONG_TYPE'), ('Label', 'STRING_TYPE'), ('__DAP__', 'LONG_TYPE'), ('__LAP__', 'LONG_TYPE')]),
          {'skip': 1}
    ))))"""

    val op = RacoParser.parsePlan(plan)
    Relational.lower(spark, op)
    val stored = spark.table("public_adhoc_netflow_subset").collect()
    val byBytes = stored.map(r => r.getAs[Double]("TotBytes") -> r.getAs[Double]("RATE")).toMap
    assert(stored.length == 2) // 500.0 and 1000.0 pass the >250 filter
    assert(byBytes(500.0) == 500.0 / 3.2 / 1000.0)
    assert(byBytes(1000.0) == 1000.0 / 0.8 / 1000.0)
  }

  test("Scan + positional select against a registered table") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    TestSpark.df(new StructType().add("k", StringType).add("v", LongType),
      Seq(Row("a", 1L), Row("b", 5L), Row("c", 9L)))
      .createOrReplaceTempView("public_adhoc_t1")
    val op = RacoParser.parsePlan(
      """Dump(Apply([('k', NamedAttributeRef('k')), ('v2', PLUS(NamedAttributeRef('v'), NumericLiteral(1)))],
           Select(GT(UnnamedAttributeRef(1, None), NumericLiteral(3)),
             Scan(RelationKey('public','adhoc','t1'),
               Scheme([('k', 'STRING_TYPE'), ('v', 'LONG_TYPE')]), 10000,
               RepresentationProperties(frozenset([]), None, None)))))""")
    val got = Relational.lower(spark, op).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("b", 6L), ("c", 10L)))
  }

  test("Scan scheme order is authoritative for positional refs (permuted backing table)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // backing table's PHYSICAL order is (v, k) — the declared Scheme says
    // (k, v); positions must bind to the scheme (reference
    // RacoOperators.kt:156), so $1 is v, not k
    TestSpark.df(new StructType().add("v", LongType).add("k", StringType),
      Seq(Row(1L, "a"), Row(5L, "b"), Row(9L, "c")))
      .createOrReplaceTempView("public_adhoc_perm")
    val op = RacoParser.parsePlan(
      """Dump(Select(GT(UnnamedAttributeRef(1, None), NumericLiteral(3)),
             Scan(RelationKey('public','adhoc','perm'),
               Scheme([('k', 'STRING_TYPE'), ('v', 'LONG_TYPE')]), 10000,
               RepresentationProperties(frozenset([]), None, None))))""")
    val got = Relational.lower(spark, op).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("b", 5L), ("c", 9L)))
    // a scheme column missing from the table fails loudly, not silently
    val bad = Relational.Scan("public_adhoc_perm",
      Some(new StructType().add("nope", LongType)))
    intercept[IllegalArgumentException](Relational.lower(spark, bad))
  }
}
