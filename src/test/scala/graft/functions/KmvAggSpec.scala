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

  test("sample buffer keeps bottom-k by hash with values; collisions keep min value") {
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 40) {
      val k = 1 + rnd.nextInt(12)
      // small hash domain → frequent collisions exercise the min-value rule
      val xs = Seq.fill(rnd.nextInt(150))((rnd.nextInt(40).toLong, rnd.nextDouble()))
      val b = new KmvSampleBuffer(k)
      xs.foreach { case (h, v) => b.add(h, v) }
      val expect = xs.groupBy(_._1).map { case (h, hv) => (h, hv.map(_._2).min) }
        .toSeq.sortBy(_._1).take(k)
      val got = b.toArrayData.array.toSeq.map { r =>
        val row = r.asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
        (row.getLong(0), row.getDouble(1))
      }
      assert(got == expect)
      // merge from shuffled partials reaches the same state
      val parts = rnd.shuffle(xs).grouped(math.max(1, xs.size / 3)).map { p =>
        val pb = new KmvSampleBuffer(k); p.foreach { case (h, v) => pb.add(h, v) }; pb
      }
      val m = new KmvSampleBuffer(k)
      parts.foreach(m.mergeFrom)
      val gotM = m.toArrayData.array.toSeq.map { r =>
        val row = r.asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
        (row.getLong(0), row.getDouble(1))
      }
      assert(gotM == expect)
    }
  }

  test("approx quantiles land within ~3 rank-σ of exact quantiles (sf0.01)") {
    val res = graft.RelationalQueries.approxQuantiles(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.1, 0.5, 0.9, 0.99))").as("ps"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(res.nonEmpty && res.keySet == exact.keySet)
    // rank error of a k-sample quantile ≈ √(p(1-p)/k); compare by VALUE
    // against the exact quantile at p ± 3σ rank tolerance via the exact
    // quantiles at the perturbed ranks
    for ((g, row) <- res; (p, i) <- Seq(0.1, 0.5, 0.9, 0.99).zipWithIndex) {
      val k = row.getLong(1).toDouble
      val sigma = math.sqrt(p * (1 - p) / k)
      val (lo, hi) = (math.max(0, p - 3 * sigma), math.min(1, p + 3 * sigma))
      val bounds = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
        .filter(col("l_returnflag") === g)
        .agg(expr(s"percentile(l_extendedprice, array($lo, $hi))")).head().getSeq[Double](0)
      val v = row.getDouble(2 + i)
      assert(v >= bounds(0) - 1e-9 && v <= bounds(1) + 1e-9,
        s"group $g p=$p: sampled $v outside exact-rank band [${bounds(0)}, ${bounds(1)}]")
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
