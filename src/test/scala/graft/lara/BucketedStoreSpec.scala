package graft.lara

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bucketed stores: two tables bucketed on the join key must join without
  * any shuffle exchange — the pay-once co-location contract.
  */
class BucketedStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join with zero exchanges") {
    val st = new StructType().add("k", LongType).add("v", IntegerType)
    def mk(n: Int, mult: Int) = LaraTable(
      df(st, (1 to n).map(i => Row(i.toLong, i * mult))),
      LaraSchema(Seq("k"), Seq(ValSpec("v", IntegerType, 0))))
    mk(200, 1).storeBucketed("bucket_a", 4)
    mk(150, 10).storeBucketed("bucket_b", 4)

    // force the sort-merge path: at test sizes Spark would broadcast (which
    // also avoids a shuffle, but doesn't demonstrate bucket co-location)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try testJoin() finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  private def testJoin(): Unit = {
    val joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString()
    assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    assert(joined.count() == 150)

    // and a bucketed-key aggregation also skips the shuffle
    val agg = spark.table("bucket_a").groupBy(col("k")).agg(sum(col("v")))
    agg.collect()
    val ap = agg.queryExecution.executedPlan.toString()
    assert(!ap.contains("Exchange hashpartitioning"), s"bucketed agg shuffles:\n$ap")
  }

  test("compactStore: appended small files collapse, data identical, order restored") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/store"
    val st = new StructType().add("k", LongType).add("v", IntegerType)
    val schema = LaraSchema(Seq("k"), Seq(ValSpec("v", IntegerType, 0)))
    // six micro-batch appends, interleaved key ranges (appends do not
    // maintain global order — compaction must restore it)
    for (b <- 0 until 6) {
      val rows = (0 until 10).map(i => Row((i * 6 + b).toLong, b * 100 + i))
      LaraTable(df(st, rows), schema).appendStore(dir)
    }
    val expected = rowSet(spark.read.parquet(dir))
    val filesBefore = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 6, s"appends should leave many files, got $filesBefore")

    val (nb, na) = LaraTable.compactStore(spark, dir, Seq("k"), schema.vals)
    assert(nb == filesBefore && na == 1, s"expected collapse to 1 file, got $nb -> $na")
    assert(rowSet(spark.read.parquet(dir)) == expected, "compaction must not change data")
    // single range-partitioned, sorted file => globally ordered scan
    val ks = spark.read.parquet(dir).collect().map(_.getLong(0)).toSeq
    assert(ks == ks.sorted, "compacted store must be access-path-sorted")
    // idempotent: compacting a compacted store is a no-op shape-wise
    val (nb2, na2) = LaraTable.compactStore(spark, dir, Seq("k"), schema.vals)
    assert(nb2 == 1 && na2 == 1)
  }
}
