package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** KMV bottom-k distinct sketch: buffer laws (vs a sort-based reference,
  * under duplicates, merge grouping, serde round trips) and the aggregate's
  * end-to-end behavior incl. the exact-below-k branch and SQL parity.
  */
class KmvAggSpec extends AnyFunSuite {
  import TestSpark._

  private def reference(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("buffer matches sort-based reference under random inserts with duplicates") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 50) {
      val k = 1 + rnd.nextInt(16)
      val n = rnd.nextInt(200)
      // small value domain → heavy duplication, the distinct-collapse path
      val xs = Seq.fill(n)(rnd.nextInt(60).toLong)
      val b = new KmvBuffer(k)
      xs.foreach(b.add)
      assert(b.toArrayData.toLongArray().toSeq == reference(xs, k), s"trial $trial k=$k")
    }
  }

  test("merge is equivalent to inserting everything into one buffer") {
    val rnd = new scala.util.Random(8)
    for (_ <- 1 to 30) {
      val k = 1 + rnd.nextInt(12)
      val xs = Seq.fill(rnd.nextInt(150))(rnd.nextLong() & 0xFFFFFFFFL)
      val parts = xs.grouped(math.max(1, xs.size / 4)).toSeq
      val merged = new KmvBuffer(k)
      parts.foreach { p =>
        val part = new KmvBuffer(k)
        p.foreach(part.add)
        // serde round trip on every partial, like a real shuffle
        val bytes = part.serialize()
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val back = new KmvBuffer(k)
        val m = bb.getInt
        (1 to m).foreach(_ => back.add(bb.getLong))
        merged.mergeFrom(back)
      }
      assert(merged.toArrayData.toLongArray().toSeq == reference(xs, k))
    }
  }

  test("aggregate end-to-end: distinct below k is exact, retained set is the true bottom-k") {
    import org.apache.spark.sql.graft.bridge
    val k = 8
    val df = spark.range(0, 1000)
      .select((col("id") % 20).as("g"), (col("id") % 100).as("v")) // 5 distinct v per g
    val mins = bridge.column(KmvSmallest(
      bridge.expression(PortableHash.hash60(col("v"))), k).toAggregateExpression())
    val rows = df.groupBy(col("g")).agg(mins.as("mins")).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val g = r.getLong(0)
      val expect = reference((0 until 5).map(i => PortableHash.local60((g + 20L * i).toString)), k)
      assert(r.getSeq[Long](1) == expect, s"group $g")
    }
  }

  test("SQL registration kmv_smallest matches the DSL") {
    graft.GraftExtensions.register(spark)
    val df = spark.range(0, 500).select((col("id") % 7).as("g"), col("id").as("v"))
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT g, kmv_smallest(portable_hash60(CAST(v AS STRING)), 16) AS mins FROM kmv_in GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    import org.apache.spark.sql.graft.bridge
    val viaDsl = df.groupBy(col("g")).agg(bridge.column(KmvSmallest(
        bridge.expression(PortableHash.hash60(col("v"))), 16).toAggregateExpression()).as("mins"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaDsl)
  }
}
