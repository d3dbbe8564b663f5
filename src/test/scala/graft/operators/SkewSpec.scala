package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Salted join equals the plain join on skewed data; partitioned store
  * prunes partitions on key-prefix filters.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("saltedJoin result equals plain join on a skewed key") {
    val st = new StructType().add("k", StringType).add("x", IntegerType)
    // 500 rows of hot key + a few cold
    val left = df(st, (1 to 500).map(i => Row("hot", i)) ++ Seq(Row("c1", 1), Row("c2", 2)))
    val right = df(new StructType().add("k", StringType).add("y", IntegerType),
      Seq(Row("hot", 10), Row("hot", 20), Row("c1", 30)))
    val plain = left.join(right, Seq("k"))
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 8)
    assert(rowSet(salted.select("k", "x", "y")) == rowSet(plain.select("k", "x", "y")))
    assert(salted.count() == 1001) // 500*2 hot + 1
  }

  test("saltedJoin spreads fully-duplicate rows (degenerate-salt regression)") {
    val st = new StructType().add("k", StringType).add("x", IntegerType)
    // 500 byte-identical rows: a content-hash salt would put them all in one
    // sub-key and the skew would survive
    val left = df(st, Seq.fill(500)(Row("hot", 7)))
    val right = df(new StructType().add("k", StringType).add("y", IntegerType),
      Seq(Row("hot", 10), Row("hot", 20)))
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 8)
    assert(salted.count() == 1000)
    val spread = left.select(Skew.salt(8).as("s")).agg(countDistinct(col("s"))).head.getLong(0)
    assert(spread == 8, s"expected all 8 sub-keys used, got $spread")
  }

  test("storePartitioned: key filter prunes partitions at read") {
    import graft.lara._
    val st = new StructType().add("k", StringType).add("j", IntegerType).add("v", IntegerType)
    val t = LaraTable(
      df(st, Seq(Row("a", 1, 10), Row("b", 2, 20), Row("c", 3, 30))),
      LaraSchema(Seq("k", "j"), Seq(ValSpec("v", IntegerType, 0))))
    val dir = java.nio.file.Files.createTempDirectory("part_store").toString + "/t"
    t.storePartitioned(dir)
    val back = spark.read.parquet(dir).filter(col("k") === "b")
    assert(back.collect().map(r => r.getAs[Int]("v")).toSeq == Seq(20))
    val scan = back.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters: [") && scan.contains("k#"),
      s"no partition filter in:\n$scan")
  }
}
