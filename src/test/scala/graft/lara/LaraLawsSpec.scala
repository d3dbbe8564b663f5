package graft.lara

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Algebraic laws of the Lara operators (reference property tests
  * reinterpreted per SURVEY §5/FIXTURES §6): ⊕ identity, union
  * commutativity, agg∘agg collapse, ⊗ annihilator. Property-style with a
  * seeded generator (seed logged, like the reference's `TupleEncodeTest`).
  */
class LaraLawsSpec extends AnyFunSuite {
  import TestSpark._

  private val plus = PlusFn(0, c => sum(c).cast("int"), _ + _)
  private val times = TimesFn(0, 0, 0, _ * _)
  private val seed = 42
  private val rnd = new scala.util.Random(seed)
  info(s"random seed = $seed")

  private def randomRows(): List[(String, Int, Int)] =
    List.fill(12)((Seq("a", "b", "c", "d")(rnd.nextInt(4)), rnd.nextInt(4), rnd.nextInt(11) - 5))

  private def mk(rows: List[(String, Int, Int)]): LaraTable = {
    val st = new StructType().add("k", StringType).add("j", IntegerType).add("v", IntegerType)
    // collapse duplicate keys first (tables are keyed sets)
    val d = df(st, rows.map(r => Row(r._1, r._2, r._3)))
      .groupBy("k", "j").agg(sum(col("v")).cast("int").as("v"))
    LaraTable(d, LaraSchema(Seq("k", "j"), Seq(ValSpec("v", IntegerType, 0))))
  }

  test("law: union is commutative") {
    for (_ <- 1 to 3) {
      val (a, b) = (mk(randomRows()), mk(randomRows()))
      assert(rowSet(a.union(b, Map("v" -> plus)).df) == rowSet(b.union(a, Map("v" -> plus)).df))
    }
  }

  test("law: agg∘agg collapses to one agg (api/TupleOp.kt:353-366)") {
    for (_ <- 1 to 3) {
      val a = mk(randomRows())
      val twoStep = a.agg(Seq("k", "j"), Map("v" -> plus)).agg(Seq("k"), Map("v" -> plus))
      val oneStep = a.agg(Seq("k"), Map("v" -> plus))
      assert(rowSet(twoStep.df) == rowSet(oneStep.df))
    }
  }

  test("law: union with empty table = agg to common keys") {
    for (_ <- 1 to 3) {
      val a = mk(randomRows())
      val empty = LaraTable(
        df(new StructType().add("k", StringType).add("v", IntegerType), Seq()),
        LaraSchema(Seq("k"), Seq(ValSpec("v", IntegerType, 0))))
      assert(rowSet(a.union(empty, Map("v" -> plus)).df) ==
        rowSet(a.agg(Seq("k"), Map("v" -> plus)).df))
    }
  }

  test("law: ⊗ annihilator — joining a zero row yields the result zero") {
    for (v <- Seq(-3, 0, 4)) {
      val st = new StructType().add("k", StringType).add("v", IntegerType)
      val a = LaraTable(df(st, Seq(Row("x", 0))), LaraSchema(Seq("k"), Seq(ValSpec("v", IntegerType, 0))))
      val b = LaraTable(df(st, Seq(Row("x", v))), LaraSchema(Seq("k"), Seq(ValSpec("v", IntegerType, 0))))
      val j = a.join(b, Map("v" -> times))
      assert(rowSet(j.df) == Set(Seq[Any]("x", 0)))
      // and zeroDiscard removes it entirely — sparsity preserved
      assert(rowSet(a.join(b, Map("v" -> times), zeroDiscard = true).df).isEmpty)
    }
  }

  test("parquet round-trip preserves tuples (TupleEncodeTest analog)") {
    for (_ <- 1 to 2) {
      val a = mk(randomRows())
      val dir = java.nio.file.Files.createTempDirectory("lara_rt").toString + "/t"
      a.df.write.mode("overwrite").parquet(dir)
      assert(rowSet(spark.read.parquet(dir)) == rowSet(a.df))
    }
  }
}
