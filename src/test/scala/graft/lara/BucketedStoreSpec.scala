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

  test("range store(path, numFiles): per-file key ranges disjoint AND rows inside each file key-sorted") {
    // the DAP/LAP layout contract behind the lara_store_layout gate row:
    // the gate proves disjointness/coverage through the oracle; this spec
    // additionally pins the LOCAL access path — physical row order inside
    // every file — which no aggregate can observe.
    val st = new StructType().add("k", LongType).add("j", LongType).add("v", LongType)
    val rows = new scala.util.Random(42).shuffle(
      (1 to 3000).map(i => Row((i % 500).toLong, (i / 500).toLong, i.toLong)).toVector)
    val t = LaraTable(df(st, rows),
      LaraSchema(Seq("k", "j"), Seq(ValSpec("v", LongType, 0L))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_lstore_spec").toString
    t.store(s"$tmp/t", numFiles = 4)
    val files = new java.io.File(s"$tmp/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length == 4, s"expected 4 data files, got ${files.length}")
    val ranges = files.map { f =>
      // one file read alone: collect() preserves the file's row order
      val got = spark.read.parquet(f).select(col("k"), col("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sameElements(got.sorted),
        s"rows inside $f are not sorted by the access path")
      (got.head, got.last)
    }
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(implicitly[Ordering[(Long, Long)]].lt(hiA, loB),
          s"file ranges overlap: hi=$hiA >= next lo=$loB")
      case _ =>
    }
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

  test("compactStore: batch=<id> idempotent-sink layout compacts (recursive listing sees nested files)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_b").toString + "/store"
    val st = new StructType().add("k", LongType).add("v", IntegerType)
    val schema = LaraSchema(Seq("k"), Seq(ValSpec("v", IntegerType, 0)))
    for (b <- 0 until 4) {
      val rows = (0 until 10).map(i => Row((i * 4 + b).toLong, b * 100 + i))
      LaraTable(df(st, rows), schema).appendStoreBatch(dir, b.toLong)
    }
    val expected = rowSet(LaraTable.load(spark, dir, Seq("k"), schema.vals).df)
    val (nb, na) = LaraTable.compactStore(spark, dir, Seq("k"), schema.vals)
    // a flat listing would report 0 files before (all parquet sits inside
    // batch= subdirectories) — the recursive walk must count them. Batches
    // 0..2 fold into batch=0 (1 file); batch=3 (the highest id — the only
    // one an at-least-once writer can replay) is excluded and carried over.
    assert(nb >= 4 && na == 2, s"expected >=4 nested files -> 2, got $nb -> $na")
    assert(rowSet(LaraTable.load(spark, dir, Seq("k"), schema.vals).df) == expected,
      "compaction must not change data")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch=0", "batch=3"), s"batch layout must survive compaction: $dirs")
    // the store stays appendable: a batch writer after compaction works,
    // and a replay of the excluded last batch stays idempotent
    LaraTable(df(st, Seq(Row(100L, 1))), schema).appendStoreBatch(dir, 4L)
    LaraTable(df(st, Seq(Row(100L, 1))), schema).appendStoreBatch(dir, 4L)
    assert(LaraTable.load(spark, dir, Seq("k"), schema.vals).df.count() == expected.size + 1)
    // within each file rows stay access-path-sorted (the per-file contract;
    // global order across batch dirs is re-established by realizeSorted)
    for (bd <- new java.io.File(dir).listFiles(); if bd.isDirectory;
         f <- bd.listFiles(); if f.getName.endsWith(".parquet")) {
      val ks = spark.read.parquet(f.getPath).collect().map(_.getLong(0)).toSeq
      assert(ks == ks.sorted, s"file ${f.getName} in ${bd.getName} not sorted")
    }
  }

  test("compactStore zorderBy: files carry disjoint z-ranges over both dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zcompact").toString + "/store"
    val st = new StructType().add("x", LongType).add("y", LongType).add("v", IntegerType)
    val schema = LaraSchema(Seq("x", "y"), Seq(ValSpec("v", IntegerType, 0)))
    // appends cover a 32x32 grid in row-major slices — the worst layout for
    // y-pruning; z-order compaction must regain it
    for (b <- 0 until 4) {
      val rows = for (x <- 0 until 8; y <- 0 until 32)
        yield Row((b * 8 + x).toLong, y.toLong, b)
      LaraTable(df(st, rows), schema).appendStore(dir)
    }
    val expected = rowSet(spark.read.parquet(dir))

    val (_, na) = LaraTable.compactStore(spark, dir, Seq("x", "y"), schema.vals,
      targetFileBytes = 4096, zorderBy = Seq("x", "y"), zorderBits = 5)
    assert(na >= 2, s"need multiple output files to observe clustering, got $na")
    assert(rowSet(spark.read.parquet(dir)) == expected, "z-compaction must not change data")

    // per-file z-ranges must be disjoint (range partitioning on zval), and
    // each file's (x, y) bounding box strictly smaller than the full grid
    // on at least one axis — the min/max pruning the rewrite buys
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    val spans = files.map { f =>
      val d = spark.read.parquet(f)
        .select(graft.pipeline.Layout.zValueN(Seq(col("x"), col("y")), 5).as("z"),
          col("x"), col("y"))
        .agg(min(col("z")), max(col("z")),
          min(col("x")), max(col("x")), min(col("y")), max(col("y")))
        .head()
      (d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3), d.getLong(4), d.getLong(5))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi, _, _, _, _), (lo, _, _, _, _, _)) =>
        assert(hi <= lo, s"file z-ranges overlap: $spans")
      case _ =>
    }
    val shrunk = spans.count { case (_, _, x0, x1, y0, y1) =>
      (x1 - x0) < 31 || (y1 - y0) < 31 }
    assert(shrunk == spans.length,
      s"every file's bounding box should shrink on some axis: $spans")
  }
}
