package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.{Dedup, Similarity}

/** Differential tests: each fused kernel must produce values identical to
  * the HOF formulation it replaced (which the DuckDB oracles mirror).
  */
class VectorKernelsSpec extends AnyFunSuite {
  import TestSpark._

  test("MinHashSig kernel == HOF universal-hash formulation (incl. negative bases)") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 60).map { i =>
      // mix of 60-bit positive bases (the pipeline contract) and raw
      // negative longs (the xxhash64 family) — floorMod in the kernel
      // must match the HOF/pmod arithmetic on both
      Row(i.toLong, (1 to (1 + rnd.nextInt(30))).map(_ =>
        if (rnd.nextBoolean()) rnd.nextLong(1L << 60) else -rnd.nextLong(1L << 60)).toSeq)
    }
    val st = new StructType().add("id", LongType).add("bh", ArrayType(LongType))
    val d = df(st, rows)
    val cmp = d.select(
        Dedup.minhashSignaturePortable(col("bh"), 32).as("k"),
        Dedup.minhashSignaturePortableHof(col("bh"), 32).as("h"))
      .collect()
    cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("SimHash64 kernel == HOF formulation (incl. empty array)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 60).map { i =>
      Row(i.toLong, (0 until rnd.nextInt(40)).map(_ => rnd.nextLong(1L << 60)).toSeq)
    }
    val st = new StructType().add("id", LongType).add("th", ArrayType(LongType))
    val d = df(st, rows)
    val cmp = d.select(Dedup.simhash(col("th")).as("k"), Dedup.simhashHof(col("th")).as("h"))
      .collect()
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("LshBuckets kernel == HOF formulation on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cmp = emb.select(
        Similarity.lshBandBuckets(col("embedding"), 4, 4, 64).as("k"),
        Similarity.lshBandBucketsHof(col("embedding"), 4, 4, 64).as("h"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("LshBuckets fails fast on a hyperplane/embedding dim mismatch") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // dim=32 against 64-element embeddings: must throw, not bucket-0 everything
    val ex = intercept[org.apache.spark.SparkException] {
      emb.select(Similarity.lshBandBuckets(col("embedding"), 4, 4, 32).as("k")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("lsh_buckets")), s"unexpected failure: $ex")
  }
}
